"""Public API surface: flat Interface, XML writer round-trip (the
reference's implicit serialization test — SURVEY §4)."""
import os

import numpy as np

SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                     "cornell.xml")


def test_interface_builds_scene():
    from libyafaray_tpu.scene.interface import Interface

    yi = Interface()
    yi.params_clear_all()
    yi.params_set_string("type", "shinydiffusemat")
    yi.params_set_color("color", 0.7, 0.2, 0.1)
    yi.create_material("red")

    yi.start_geometry()
    yi.start_tri_mesh(0, 3, 1, False, False, 0)
    yi.add_vertex(0, 0, 0)
    yi.add_vertex(1, 0, 0)
    yi.add_vertex(0, 1, 0)
    yi.add_triangle(0, 1, 2, 1)
    yi.end_tri_mesh()
    yi.end_geometry()

    yi.params_set_string("type", "pointlight")
    yi.params_set_point("from", 0.3, 0.3, 2.0)
    yi.params_set_color("color", 1, 1, 1)
    yi.params_set_float("power", 10.0)
    yi.create_light("lamp")

    yi.params_set_string("type", "perspective")
    yi.params_set_int("resx", 8)
    yi.params_set_int("resy", 8)
    yi.params_set_point("from", 0.3, 0.3, 3.0)
    yi.params_set_point("to", 0.3, 0.3, 0.0)
    yi.params_set_point("up", 0.3, 1.3, 3.0)
    yi.create_camera("cam")

    yi.params_set_string("type", "constant")
    yi.params_set_color("color", 0, 0, 0)
    yi.create_background("bg")

    yi.params_set_string("type", "directlighting")
    yi.create_integrator("default")

    cs = yi.scene.compile()
    assert cs.static.n_tris_real == 1
    assert len(cs.static.lights) == 1
    assert yi.get_version()


def test_xml_roundtrip():
    """write_xml(parse(X)) parses back to an equivalent scene."""
    from libyafaray_tpu.scene.xml_parser import parse_xml_file, \
        parse_xml_string
    from libyafaray_tpu.scene.xml_writer import write_xml

    s1 = parse_xml_file(SCENE)
    xml = write_xml(s1)
    s2 = parse_xml_string(xml)

    c1 = s1.compile()
    c2 = s2.compile()
    assert c1.static.n_tris_real == c2.static.n_tris_real
    assert len(c1.static.lights) == len(c2.static.lights)
    assert c1.static.lights[0].samples == c2.static.lights[0].samples
    np.testing.assert_allclose(
        np.asarray(c1.arrays["tris"]["v0"]), np.asarray(c2.arrays["tris"]["v0"]))
    np.testing.assert_allclose(
        np.asarray(c1.arrays["materials"]["diffuse_color"]),
        np.asarray(c2.arrays["materials"]["diffuse_color"]))
    assert s1.render_params.get_int("width") == \
        s2.render_params.get_int("width")
    # camera orientation survives
    assert np.allclose(c1.camera.fwd, c2.camera.fwd)

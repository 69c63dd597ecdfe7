"""`python -m libyafaray_tpu` — alias for the yafaray-xml CLI.

Reference role: src/xml_loader/yafaray_xml.cc [H] (SURVEY §2.13) — the
reference ships a `yafaray-xml` executable; this package exposes the
same surface as a console script (pyproject [project.scripts]) and as a
module entry point.
"""
from libyafaray_tpu.cli.yafaray_xml import main

if __name__ == "__main__":
    raise SystemExit(main())

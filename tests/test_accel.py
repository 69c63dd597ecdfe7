"""BVH build + traversal vs brute force on random triangle soups
(SURVEY §4: 'kd/BVH: random rays vs brute-force intersect — exact same
hits & t')."""
import numpy as np
import jax.numpy as jnp
import pytest

from libyafaray_tpu.accel.bvh import build_bvh
from libyafaray_tpu.ops.intersect import closest_hit_brute, pad_triangles, \
    shadow_transmission_brute
from libyafaray_tpu.ops.bvh_traverse import closest_hit_bvh, \
    shadow_transmission_bvh


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(42)
    t = 700
    center = rng.uniform(-1, 1, (t, 3))
    v0 = center + rng.normal(0, 0.08, (t, 3))
    e1 = rng.normal(0, 0.15, (t, 3))
    e2 = rng.normal(0, 0.15, (t, 3))
    return v0.astype(np.float32), e1.astype(np.float32), e2.astype(np.float32)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(43)
    n = 512
    org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_bvh_matches_brute(soup, rays):
    v0, e1, e2 = soup
    org, d = rays
    v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 512)
    tris_p = dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                  e2=jnp.asarray(e2p))
    hb = closest_hit_brute(tris_p, org, d, chunk=512)

    bvh = {k: jnp.asarray(v) for k, v in build_bvh(v0, e1, e2).items()}
    tris = dict(v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2))
    hv = closest_hit_bvh(bvh, tris, org, d)

    assert np.array_equal(np.asarray(hb.hit), np.asarray(hv.hit))
    m = np.asarray(hb.hit)
    assert np.allclose(np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hb.tri)[m], np.asarray(hv.tri)[m])


def test_bvh_shadow_matches_brute(soup, rays):
    v0, e1, e2 = soup
    org, d = rays
    rng = np.random.default_rng(44)
    t = v0.shape[0]
    filt = (rng.random((t, 3)) * (rng.random((t, 1)) > 0.5)).astype(np.float32)
    dist = jnp.full((org.shape[0],), 2.5, jnp.float32)

    v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 512)
    filt_p = np.concatenate(
        [filt, np.zeros((v0p.shape[0] - t, 3), np.float32)]
    )
    tris_p = dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                  e2=jnp.asarray(e2p))
    tr_b = shadow_transmission_brute(tris_p, jnp.asarray(filt_p), org, d,
                                     dist, chunk=512)

    bvh = {k: jnp.asarray(v) for k, v in build_bvh(v0, e1, e2).items()}
    tris = dict(v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2))
    tr_v = shadow_transmission_bvh(bvh, tris, jnp.asarray(filt), org, d,
                                   dist)
    # tiny differences possible for hits exactly at the tmax boundary
    assert np.allclose(np.asarray(tr_b), np.asarray(tr_v), atol=2e-3)


def test_bvh_nodes_wellformed(soup):
    v0, e1, e2 = soup
    bvh = build_bvh(v0, e1, e2)
    n = bvh["bb_min"].shape[0]
    assert np.all(bvh["hit_next"] < n) and np.all(bvh["miss_next"] < n)
    leaves = bvh["first_tri"] >= 0
    assert bvh["tri_count"][leaves].max() <= 4
    assert bvh["tri_count"][leaves].sum() == v0.shape[0]
    assert sorted(bvh["tri_order"].tolist()) == list(range(v0.shape[0]))


def test_native_builder_traversal_correct(soup, rays):
    """The C++ builder's BVH gives identical hits to brute force (tree may
    legitimately differ from the numpy builder's; traversal results must
    not)."""
    from libyafaray_tpu.accel.native import build_bvh_native

    v0, e1, e2 = soup
    bvh_np = build_bvh_native(v0, e1, e2)
    if bvh_np is None:
        pytest.skip("no native builder in this environment")
    org, d = rays
    v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 512)
    tris_p = dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                  e2=jnp.asarray(e2p))
    hb = closest_hit_brute(tris_p, org, d, chunk=512)
    bvh = {k: jnp.asarray(v) for k, v in bvh_np.items()}
    tris = dict(v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2))
    hv = closest_hit_bvh(bvh, tris, org, d)
    assert np.array_equal(np.asarray(hb.hit), np.asarray(hv.hit))
    m = np.asarray(hb.hit)
    assert np.allclose(np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hb.tri)[m], np.asarray(hv.tri)[m])
    # well-formed: every triangle referenced exactly once
    assert sorted(bvh_np["tri_order"].tolist()) == list(range(v0.shape[0]))


def test_pallas_kernels_interpret_match_brute(soup, rays):
    """Pallas intersection kernels (interpret mode on CPU) == jnp brute."""
    from libyafaray_tpu.ops import pallas_intersect as pli

    pli.INTERPRET = True
    try:
        v0, e1, e2 = soup
        # tiny path (<= TINY_TRIS: static unroll kernels)
        v0s, e1s, e2s = v0[:48], e1[:48], e2[:48]
        orgs, ds = rays
        orgs, ds = orgs[:128], ds[:128]
        pack_s, cl_s, _ = pli.build_tri_pack(v0s, e1s, e2s)
        ts, tris, us, vs, hs = pli.closest_hit_pallas(
            jnp.asarray(pack_s), jnp.asarray(cl_s), orgs, ds,
            jnp.full((128,), 5e-5), jnp.full((128,), jnp.inf), n_tris=48)
        v0p_s, e1p_s, e2p_s, _ = pad_triangles(v0s, e1s, e2s, 48)
        hb_s = closest_hit_brute(dict(v0=jnp.asarray(v0p_s),
                                      e1=jnp.asarray(e1p_s),
                                      e2=jnp.asarray(e2p_s)),
                                 orgs, ds, chunk=48)
        assert np.array_equal(np.asarray(hs), np.asarray(hb_s.hit))
        ms = np.asarray(hb_s.hit)
        assert np.allclose(np.asarray(ts)[ms], np.asarray(hb_s.t)[ms],
                           rtol=1e-4)
        assert np.array_equal(np.asarray(tris)[ms],
                              np.asarray(hb_s.tri)[ms])

        # >BT so there are multiple clusters; Morton order exercises the
        # orig-id remap row and the cluster-culling path
        v0, e1, e2 = v0[:400], e1[:400], e2[:400]
        org, d = rays
        org, d = org[:256], d[:256]
        order = pli.morton_order(v0, e1, e2)
        pack10, cluster8, s_ord = pli.build_tri_pack(v0, e1, e2, order)
        tmin = jnp.full((256,), 5e-5)
        tmax = jnp.full((256,), jnp.inf)
        t, tri, u, v, hit = pli.closest_hit_pallas(
            jnp.asarray(pack10), jnp.asarray(cluster8), org, d, tmin, tmax,
            n_tris=400)
        v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 64)
        tris_p = dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                      e2=jnp.asarray(e2p))
        hb = closest_hit_brute(tris_p, org, d, chunk=64)
        assert np.array_equal(np.asarray(hit), np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        assert np.allclose(np.asarray(t)[m], np.asarray(hb.t)[m], rtol=1e-4)
        assert np.array_equal(np.asarray(tri)[m], np.asarray(hb.tri)[m])

        rng = np.random.default_rng(9)
        filt = (rng.random((400, 3)) * (rng.random((400, 1)) > 0.5)).astype(
            np.float32)
        filt_pk = filt[s_ord]
        filt4 = jnp.asarray(np.concatenate(
            [filt_pk.T, np.zeros((1, filt_pk.shape[0]), np.float32)]))
        dist = jnp.full((256,), 2.5, jnp.float32)
        tr_p = pli.shadow_transmission_pallas(
            jnp.asarray(pack10), jnp.asarray(cluster8), filt4, org, d, dist,
            n_tris=400)
        filt_pad = np.concatenate(
            [filt, np.zeros((v0p.shape[0] - 400, 3), np.float32)])
        tr_b = shadow_transmission_brute(tris_p, jnp.asarray(filt_pad),
                                         org, d, dist, chunk=64)
        assert np.allclose(np.asarray(tr_p), np.asarray(tr_b), atol=2e-3)
    finally:
        pli.INTERPRET = False


def test_mxu_mt_tile_algebra_matches_reference():
    """The bilinear (MXU) Möller-Trumbore formulation must agree with
    the direct per-pair form on the same tile (pure-jnp check of the
    triple-product algebra; TPU-precision validation lives in
    scripts/bench_intersect.py --verify-mxu)."""
    from libyafaray_tpu.ops.pallas_intersect import (_mt_tile,
                                                     _mt_tile_mxu)

    rng = np.random.default_rng(11)
    bq, bt = 64, 128
    v0 = rng.uniform(-2, 2, (bt, 3)).astype(np.float32)
    e1 = rng.normal(0, 1, (bt, 3)).astype(np.float32)
    e2 = rng.normal(0, 1, (bt, 3)).astype(np.float32)
    pack = jnp.asarray(np.concatenate(
        [v0.T, e1.T, e2.T,
         np.zeros((7, bt), np.float32)], axis=0))  # (16, bt)
    org = jnp.asarray(rng.uniform(-3, 3, (bq, 3)), jnp.float32)
    d = rng.normal(0, 1, (bq, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    t_a, u_a, v_a, ok_a = _mt_tile(pack, org, d)
    t_b, u_b, v_b, ok_b = _mt_tile_mxu(pack, org, d,
                                       (0.1, -0.2, 0.3))
    ok_a = np.asarray(ok_a)
    ok_b = np.asarray(ok_b)
    # boundary-epsilon cases may flip; bulk agreement must be near-total
    agree = (ok_a == ok_b).mean()
    assert agree > 0.999, agree
    m = ok_a & ok_b
    assert np.allclose(np.asarray(t_a)[m], np.asarray(t_b)[m],
                       rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(u_a)[m], np.asarray(u_b)[m],
                       rtol=1e-3, atol=1e-4)
    assert np.allclose(np.asarray(v_a)[m], np.asarray(v_b)[m],
                       rtol=1e-3, atol=1e-4)


def test_pallas_subcluster_culling_matches_brute(monkeypatch):
    """The n_sub>1 fine-culling path (SUB_BT sub-tiles masked via the
    order-entry high bits) must stay exact: force BT=512 on a 4K-tri
    soup so each cluster carries a 4-bit live-sub mask."""
    from libyafaray_tpu.ops import pallas_intersect as pli

    monkeypatch.setenv("LIBYAF_BT", "512")
    monkeypatch.setenv("LIBYAF_FINE", "0")  # pin the BLOCK path (the
    # r4 gathered-fine path would otherwise intercept this size)
    pli.INTERPRET = True
    try:
        rng = np.random.default_rng(7)
        t = 4000
        v0 = rng.uniform(-5, 5, (t, 3)).astype(np.float32)
        e1 = rng.normal(0, 0.4, (t, 3)).astype(np.float32)
        e2 = rng.normal(0, 0.4, (t, 3)).astype(np.float32)
        order = pli.morton_order(v0, e1, e2)
        pack, cl, s_ord = pli.build_tri_pack(v0, e1, e2, order)
        assert pack.shape[1] // cl.shape[1] == 512  # n_sub = 4
        n = 256
        org = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        tmin = jnp.full((n,), 5e-5)
        tc, tri, _, _, hit = pli.closest_hit_pallas(
            jnp.asarray(pack), jnp.asarray(cl), org, d, tmin,
            jnp.full((n,), jnp.inf), n_tris=t)
        v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 512)
        tris_p = dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                      e2=jnp.asarray(e2p))
        hb = closest_hit_brute(tris_p, org, d, tmin, chunk=512)
        assert np.array_equal(np.asarray(hit), np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        assert np.allclose(np.asarray(tc)[m], np.asarray(hb.t)[m],
                           rtol=1e-4)
        assert np.array_equal(np.asarray(tri)[m], np.asarray(hb.tri)[m])

        filt = (rng.random((t, 3)) * (rng.random((t, 1)) > 0.5)).astype(
            np.float32)
        filt_pk = filt[s_ord]
        filt4 = jnp.asarray(np.concatenate(
            [filt_pk.T, np.zeros((1, filt_pk.shape[0]), np.float32)]))
        dist = jnp.full((n,), 4.0, jnp.float32)
        tr_p = pli.shadow_transmission_pallas(
            jnp.asarray(pack), jnp.asarray(cl), filt4, org, d, dist,
            n_tris=t)
        filt_pad = np.concatenate(
            [filt, np.zeros((v0p.shape[0] - t, 3), np.float32)])
        tr_b = shadow_transmission_brute(tris_p, jnp.asarray(filt_pad),
                                         org, d, dist, chunk=512)
        assert np.allclose(np.asarray(tr_p), np.asarray(tr_b), atol=2e-3)
    finally:
        pli.INTERPRET = False


def test_pallas_fine_path_matches_brute(monkeypatch):
    """The r4 gathered-fine path (SUB_BT-granular front-to-back lists,
    FINE_GROUP sub-DMA gathers, two-round early termination, in-kernel
    key-bound early exit) must agree with brute force on hits/tri ids —
    across K1 (single-round / forced two-round) and with the early exit
    on and off (LIBYAF_EE)."""
    from libyafaray_tpu.ops import pallas_intersect as pli

    pli.INTERPRET = True
    try:
        rng = np.random.default_rng(11)
        t = 2304  # BT=128 -> pack width 2304, n_sc=18 >= FINE_GROUP
        v0 = rng.uniform(-4, 4, (t, 3)).astype(np.float32)
        e1 = rng.normal(0, 0.3, (t, 3)).astype(np.float32)
        e2 = rng.normal(0, 0.3, (t, 3)).astype(np.float32)
        order = pli.morton_order(v0, e1, e2)
        pack, cl, s_ord = pli.build_tri_pack(v0, e1, e2, order)
        assert pack.shape[1] % pli.SUB_BT == 0
        assert pack.shape[1] // pli.SUB_BT >= pli.FINE_GROUP
        n = 256
        org = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        tmin = jnp.full((n,), 5e-5)
        v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 128)
        tris_p = dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                      e2=jnp.asarray(e2p))
        hb = closest_hit_brute(tris_p, org, d, tmin, chunk=128)
        m = np.asarray(hb.hit)
        # k1=1 forces the two-round split at n_sc=18 (> 2*k1*FINE_GROUP);
        # the last two rows run the corridor-head ray sort (LIBYAF_SORT)
        for k1, ee, srt in (("0", "1", "morton"), ("1", "1", "morton"),
                            ("1", "0", "morton"), ("6", "1", "morton"),
                            ("1", "1", "entry"), ("6", "1", "entry")):
            monkeypatch.setenv("LIBYAF_K1", k1)
            monkeypatch.setenv("LIBYAF_EE", ee)
            monkeypatch.setenv("LIBYAF_SORT", srt)
            tc, tri, _, _, hit = pli.closest_hit_pallas(
                jnp.asarray(pack), jnp.asarray(cl), org, d, tmin,
                jnp.full((n,), jnp.inf), n_tris=t)
            assert np.array_equal(np.asarray(hit), m), (k1, ee, srt)
            assert np.allclose(np.asarray(tc)[m], np.asarray(hb.t)[m],
                               rtol=1e-4), (k1, ee, srt)
            assert np.array_equal(np.asarray(tri)[m],
                                  np.asarray(hb.tri)[m]), (k1, ee, srt)
        monkeypatch.setenv("LIBYAF_SORT", "morton")

        filt = (rng.random((t, 3)) * (rng.random((t, 1)) > 0.5)).astype(
            np.float32)
        filt_pk = filt[s_ord]
        filt4 = jnp.asarray(np.concatenate(
            [filt_pk.T, np.zeros((1, filt_pk.shape[0]), np.float32)]))
        dist = jnp.full((n,), 6.0, jnp.float32)
        filt_pad = np.concatenate(
            [filt, np.zeros((v0p.shape[0] - t, 3), np.float32)])
        tr_b = shadow_transmission_brute(tris_p, jnp.asarray(filt_pad),
                                         org, d, dist, chunk=128)
        for ee, srt in (("1", "morton"), ("0", "morton"), ("1", "entry")):
            monkeypatch.setenv("LIBYAF_EE", ee)
            monkeypatch.setenv("LIBYAF_SORT", srt)
            tr_p = pli.shadow_transmission_pallas(
                jnp.asarray(pack), jnp.asarray(cl), filt4, org, d, dist,
                n_tris=t)
            assert np.allclose(np.asarray(tr_p), np.asarray(tr_b),
                               atol=2e-3), (ee, srt)
    finally:
        pli.INTERPRET = False


def test_pallas_rounds_path_matches_brute(monkeypatch):
    """The r5 multi-round resorted fine path (LIBYAF_ROUNDS: capped
    visits + per-ray frontier advance + survivor resort, uncapped final
    round) must agree with brute force bit-for-bit across (rounds, cap)
    including caps small enough that every round leaves survivors."""
    from libyafaray_tpu.ops import pallas_intersect as pli

    pli.INTERPRET = True
    try:
        rng = np.random.default_rng(13)
        t = 2304  # n_sc=18 >= SORT_MIN_CLUSTERS=16 -> rounds dispatch
        v0 = rng.uniform(-4, 4, (t, 3)).astype(np.float32)
        e1 = rng.normal(0, 0.3, (t, 3)).astype(np.float32)
        e2 = rng.normal(0, 0.3, (t, 3)).astype(np.float32)
        order = pli.morton_order(v0, e1, e2)
        pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order)
        assert pack.shape[1] // pli.SUB_BT >= pli.SORT_MIN_CLUSTERS
        n = 256
        org = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        tmin = jnp.full((n,), 5e-5)
        v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 128)
        tris_p = dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                      e2=jnp.asarray(e2p))
        hb = closest_hit_brute(tris_p, org, d, tmin, chunk=128)
        m = np.asarray(hb.hit)
        for rounds, cap in (("2", "1"), ("3", "1"), ("3", "4"),
                            ("4", "2")):
            monkeypatch.setenv("LIBYAF_ROUNDS", rounds)
            monkeypatch.setenv("LIBYAF_RCAP", cap)
            tc, tri, _, _, hit = pli.closest_hit_pallas(
                jnp.asarray(pack), jnp.asarray(cl), org, d, tmin,
                jnp.full((n,), jnp.inf), n_tris=t)
            assert np.array_equal(np.asarray(hit), m), (rounds, cap)
            assert np.allclose(np.asarray(tc)[m], np.asarray(hb.t)[m],
                               rtol=1e-4), (rounds, cap)
            assert np.array_equal(np.asarray(tri)[m],
                                  np.asarray(hb.tri)[m]), (rounds, cap)
    finally:
        pli.INTERPRET = False


def test_pallas_pairs_path_matches_brute(monkeypatch):
    """The r3 pair-granular path (per-ray cluster lists expanded into
    cluster-sorted pair slots; two capped rounds + the block-sweep
    exactness fallback) must agree with brute force bit-for-bit on
    hits/tri ids.  Tiny K1/K2 caps force round 2 AND the straggler
    fallback to do real work."""
    from libyafaray_tpu.ops import pallas_intersect as pli

    monkeypatch.setenv("LIBYAF_BT", "128")
    monkeypatch.setattr(pli, "PAIRS_MIN_CLUSTERS", 4)
    monkeypatch.setattr(pli, "PAIR_K1", 2)
    monkeypatch.setattr(pli, "PAIR_K2", 3)
    monkeypatch.setattr(pli, "PAIR_KB", 4)
    monkeypatch.setattr(pli, "SHADOW_KS", 5)
    pli.INTERPRET = True
    try:
        rng = np.random.default_rng(17)
        t = 2999  # unique n_tris: the tiny caps are baked at trace time
        v0 = rng.uniform(-4, 4, (t, 3)).astype(np.float32)
        e1 = rng.normal(0, 0.45, (t, 3)).astype(np.float32)
        e2 = rng.normal(0, 0.45, (t, 3)).astype(np.float32)
        order = pli.morton_order(v0, e1, e2)
        pack, cl, s_ord = pli.build_tri_pack(v0, e1, e2, order)
        assert cl.shape[1] >= pli.PAIRS_MIN_CLUSTERS
        n = 256
        org = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        tmin = jnp.full((n,), 5e-5)
        tc, tri, _, _, hit = pli.closest_hit_pallas(
            jnp.asarray(pack), jnp.asarray(cl), org, d, tmin,
            jnp.full((n,), jnp.inf), n_tris=t)
        v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 128)
        tris_p = dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                      e2=jnp.asarray(e2p))
        hb = closest_hit_brute(tris_p, org, d, tmin, chunk=128)
        assert np.array_equal(np.asarray(hit), np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        assert np.allclose(np.asarray(tc)[m], np.asarray(hb.t)[m],
                           rtol=1e-4)
        assert np.array_equal(np.asarray(tri)[m], np.asarray(hb.tri)[m])

        filt = (rng.random((t, 3)) * (rng.random((t, 1)) > 0.5)).astype(
            np.float32)
        filt_pk = filt[s_ord]
        filt4 = jnp.asarray(np.concatenate(
            [filt_pk.T, np.zeros((1, filt_pk.shape[0]), np.float32)]))
        dist = jnp.full((n,), 3.0, jnp.float32)
        tr_p = pli.shadow_transmission_pallas(
            jnp.asarray(pack), jnp.asarray(cl), filt4, org, d, dist,
            n_tris=t)
        filt_pad = np.concatenate(
            [filt, np.zeros((v0p.shape[0] - t, 3), np.float32)])
        tr_b = shadow_transmission_brute(tris_p, jnp.asarray(filt_pad),
                                         org, d, dist, chunk=128)
        assert np.allclose(np.asarray(tr_p), np.asarray(tr_b), atol=2e-3)
    finally:
        pli.INTERPRET = False


def test_brute_unpadded_tail():
    """Brute-force chunking must cover a triangle count that is NOT a
    multiple of `chunk`: the last partial chunk was silently skipped
    (found r3 by an on-device pallas-vs-brute cross-check — a tail
    triangle's hit was missing).  Both the closest and shadow variants
    pad internally now."""
    rng = np.random.default_rng(7)
    t = 700  # 700 = 5*128 + 60: tail of 60 at chunk=128, 188 at 512
    v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.2, (t, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.2, (t, 3)).astype(np.float32)
    n = 256
    org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tris = dict(v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2))
    org, d = jnp.asarray(org), jnp.asarray(d)
    ha = closest_hit_brute(tris, org, d, chunk=128)
    hb = closest_hit_brute(tris, org, d, chunk=512)
    # reference: single chunk covering everything exactly
    hc = closest_hit_brute(tris, org, d, chunk=700)
    for h in (ha, hb):
        assert np.array_equal(np.asarray(h.hit), np.asarray(hc.hit))
        m = np.asarray(hc.hit)
        assert np.allclose(np.asarray(h.t)[m], np.asarray(hc.t)[m],
                           rtol=1e-5)
    filt = (rng.random((t, 3)) * (rng.random((t, 1)) > 0.3)).astype(
        np.float32)
    dist = jnp.full((n,), 3.0, jnp.float32)
    tra = shadow_transmission_brute(tris, jnp.asarray(filt), org, d,
                                    dist, chunk=128)
    trc = shadow_transmission_brute(tris, jnp.asarray(filt), org, d,
                                    dist, chunk=700)
    assert np.allclose(np.asarray(tra), np.asarray(trc), atol=1e-5)

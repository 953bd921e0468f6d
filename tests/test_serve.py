"""Serving surface: request building + end-to-end HTTP round trip (tiny model)."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import serve
from pepflowww_tpu.data.pdb import save_pdb
from pepflowww_tpu.data.synthetic import make_complex
from pepflowww_tpu.data.collate import mask_select_data
from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
from pepflowww_tpu.models.trunk import IPAConfig


@pytest.fixture(scope="module")
def complex_pdbs(rng):
    item = make_complex(rng, pep_len=5, rec_len=12)
    pep = mask_select_data(item, item["generate_mask"])
    rec = mask_select_data(item, ~item["generate_mask"])
    return save_pdb(pep), save_pdb(rec)


@pytest.fixture(scope="module")
def tiny_server(complex_pdbs):
    cfg = FlowModelConfig(
        node_embed_size=32, edge_embed_size=16,
        ipa=IPAConfig(c_s=32, c_z=16, c_hidden=8, no_heads=2, no_qk_points=2,
                      no_v_points=3, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1,
                      num_blocks=1),
    )
    serve.S.model = FlowModel(cfg)
    from pepflowww_tpu.data.collate import device_batch
    from pepflowww_tpu.data.synthetic import make_batch

    rng = np.random.default_rng(0)
    example = device_batch(make_batch(rng, batch_size=1, pep_len=5, rec_len=12, pad_to=32))
    example = {k: jnp.asarray(v) for k, v in example.items()}
    key = jax.random.PRNGKey(0)
    serve.S.params = jax.jit(serve.S.model.init)(
        {"params": key, "corruption": key}, example
    )["params"]
    serve.S.samplers = {}

    # serve._Server, not the stock ThreadingHTTPServer: tests exercise the
    # same deep-backlog accept queue production uses (32-client load in
    # test_batch_scheduler_concurrent_load_two_buckets overflows the stock
    # backlog of 5 on a contended host).
    server = serve._Server(("127.0.0.1", 0), serve.Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield port
    server.shutdown()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_healthz(tiny_server):
    with urllib.request.urlopen(f"http://127.0.0.1:{tiny_server}/healthz") as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"


def test_sample_with_native_peptide(tiny_server, complex_pdbs):
    pep_pdb, pocket_pdb = complex_pdbs
    out = _post(tiny_server, "/sample", {
        "pocket_pdb": pocket_pdb, "peptide_pdb": pep_pdb,
        "num_samples": 2, "num_steps": 3,
    })
    assert len(out["pdbs"]) == 2
    assert out["pdbs"][0].startswith("ATOM")
    assert len(out["metrics"]["ca_rmsd"]) == 2


def test_sample_without_native_peptide(tiny_server, complex_pdbs):
    _, pocket_pdb = complex_pdbs
    out = _post(tiny_server, "/sample", {
        "pocket_pdb": pocket_pdb, "peptide_len": 6,
        "num_samples": 1, "num_steps": 2,
    })
    assert len(out["pdbs"]) == 1
    # generated peptide has 6 residues in chain A
    pdb = out["pdbs"][0]
    pep_residues = {line[22:27] for line in pdb.splitlines()
                    if line.startswith("ATOM") and line[21] == "A"}
    assert len(pep_residues) == 6


def test_sample_error_path(tiny_server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{tiny_server}/sample",
        data=json.dumps({"pocket_pdb": "garbage"}).encode(),
    )
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        body = json.loads(e.read())
        assert "error" in body
        assert e.code == 400
    assert raised


def test_batch_scheduler_concurrent_load_two_buckets(tiny_server, complex_pdbs, rng):
    """VERDICT r2 item 8: ~32 parallel /sample requests across TWO length
    buckets. The scheduler must coalesce same-bucket requests into few device
    calls (not one call per request) and route every row to the right group.
    """
    import concurrent.futures

    pep_pdb, pocket_small = complex_pdbs  # 17 residues -> bucket 32
    big = make_complex(rng, pep_len=5, rec_len=40)  # 45 residues -> bucket 48
    pocket_big = save_pdb(mask_select_data(big, ~big["generate_mask"]))
    pep_big = save_pdb(mask_select_data(big, big["generate_mask"]))

    calls = []  # (group_key, n_rows)
    orig = serve._run_group

    def spy(group_key, rows, contexts):
        calls.append((group_key, len(rows)))
        return orig(group_key, rows, contexts)

    serve._run_group = spy
    serve.S.scheduler = None  # rebuild with the spy
    try:
        reqs = []
        for _ in range(16):
            reqs.append({"pocket_pdb": pocket_small, "peptide_pdb": pep_pdb,
                         "num_samples": 2, "num_steps": 2})
            reqs.append({"pocket_pdb": pocket_big, "peptide_pdb": pep_big,
                         "num_samples": 2, "num_steps": 2})
        with concurrent.futures.ThreadPoolExecutor(32) as ex:
            futs = [ex.submit(_post, tiny_server, "/sample", r) for r in reqs]
            outs = [f.result(timeout=900) for f in futs]
    finally:
        serve._run_group = orig
        serve.S.scheduler = None

    assert all(len(o["pdbs"]) == 2 for o in outs)
    by_group = {}
    for gk, n in calls:
        by_group.setdefault(gk, []).append(n)
    assert set(g[0] for g in by_group) == {32, 48}  # both buckets exercised
    assert sum(n for _, n in calls) == 64  # every row ran exactly once
    # Coalescing: far fewer device calls than the 32 requests, and at least
    # one genuinely large merged batch per bucket. The bound is half the
    # request count, not lower: the 2-deep execution pipeline (serve.py
    # BatchScheduler inflight) deliberately drains the pending queue faster
    # than a strictly-serial worker would, trading some merge depth for
    # device utilization — under real sustained load requests pile while
    # the device is busy and merges stay near max_batch.
    assert len(calls) <= 16, calls
    for gk, sizes in by_group.items():
        assert max(sizes) >= 8, (gk, sizes)


def test_dp_serving_over_device_mesh(tiny_server, complex_pdbs):
    """--dp serving path: merged request batches shard over the 8-virtual-
    device CPU mesh (params replicated, one SPMD sampler program, padded
    batch rounded to a device multiple). Responses must be well-formed for
    every request."""
    import concurrent.futures

    from pepflowww_tpu.parallel.mesh import make_mesh, replicate

    pep_pdb, pocket_pdb = complex_pdbs
    old_params, old_mesh = serve.S.params, serve.S.mesh
    serve.S.mesh = make_mesh()
    serve.S.params = replicate(serve.S.params, serve.S.mesh)
    serve.S.scheduler = None  # rebuild with the dp-scaled merge cap
    serve.S.samplers = {}
    try:
        req = {"pocket_pdb": pocket_pdb, "peptide_pdb": pep_pdb,
               "num_samples": 3, "num_steps": 2}  # odd count -> device pad
        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            futs = [ex.submit(_post, tiny_server, "/sample", req) for _ in range(4)]
            outs = [f.result(timeout=900) for f in futs]
    finally:
        serve.S.params, serve.S.mesh = old_params, old_mesh
        serve.S.scheduler = None
        serve.S.samplers = {}
    assert all(len(o["pdbs"]) == 3 for o in outs)
    assert all(o["pdbs"][0].startswith("ATOM") for o in outs)
    assert all(np.isfinite(o["metrics"]["ca_rmsd"]).all() for o in outs)


def test_tp_serving_over_2d_mesh(tiny_server, complex_pdbs):
    """--tp serving path: requests run through make_tp_sampler on a 4x2
    (data, model) mesh — pair rows sharded on the model axis. Responses must
    be well-formed (the numerical equivalence of the TP sampler itself is
    pinned by tests/test_tp.py)."""
    import types

    from pepflowww_tpu.parallel.mesh import replicate
    from pepflowww_tpu.parallel.tp import make_mesh_2d

    pep_pdb, pocket_pdb = complex_pdbs
    old = (serve.S.params, serve.S.mesh, serve.S.args)
    serve.S.mesh = make_mesh_2d(4, 2)
    serve.S.params = replicate(serve.S.params, serve.S.mesh)
    serve.S.args = types.SimpleNamespace(tp=2)
    serve.S.scheduler = None
    serve.S.samplers = {}
    try:
        req = {"pocket_pdb": pocket_pdb, "peptide_pdb": pep_pdb,
               "num_samples": 3, "num_steps": 2}
        out = _post(tiny_server, "/sample", req)
    finally:
        serve.S.params, serve.S.mesh, serve.S.args = old
        serve.S.scheduler = None
        serve.S.samplers = {}
    assert len(out["pdbs"]) == 3
    assert out["pdbs"][0].startswith("ATOM")
    assert np.isfinite(out["metrics"]["ca_rmsd"]).all()


def test_batch_scheduler_error_does_not_deadlock(tiny_server, complex_pdbs):
    """A device-call failure must propagate to ITS requests as HTTP 400 while
    concurrent requests in other groups complete — no hung events."""
    import concurrent.futures
    import urllib.error

    pep_pdb, pocket_pdb = complex_pdbs
    orig = serve._run_group

    def spy(group_key, rows, contexts):
        if group_key[1] == 3:  # the num_steps=3 group always fails
            raise RuntimeError("injected device failure")
        return orig(group_key, rows, contexts)

    serve._run_group = spy
    serve.S.scheduler = None
    try:
        good = {"pocket_pdb": pocket_pdb, "peptide_pdb": pep_pdb,
                "num_samples": 2, "num_steps": 2}
        bad = dict(good, num_steps=3)

        def post_status(req):
            try:
                out = _post(tiny_server, "/sample", req)
                return 200, out
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            futs = [ex.submit(post_status, bad if i % 2 else good)
                    for i in range(8)]
            results = [f.result(timeout=900) for f in futs]
    finally:
        serve._run_group = orig
        serve.S.scheduler = None

    goods = [r for c, r in results if c == 200]
    bads = [r for c, r in results if c == 400]
    assert len(goods) == 4 and len(bads) == 4, [c for c, _ in results]
    assert all(len(r["pdbs"]) == 2 for r in goods)
    assert all("injected device failure" in r["error"] for r in bads)


def test_batch_scheduler_merges_concurrent_requests(tiny_server, complex_pdbs):
    """Two concurrent same-bucket requests should share one device batch."""
    import concurrent.futures

    pep_pdb, pocket_pdb = complex_pdbs
    calls = []
    orig = serve._run_group

    def spy(group_key, rows, contexts):
        calls.append(len(rows))
        return orig(group_key, rows, contexts)

    serve._run_group = spy
    serve.S.scheduler = None  # rebuild with the spy
    try:
        req = {"pocket_pdb": pocket_pdb, "peptide_pdb": pep_pdb,
               "num_samples": 2, "num_steps": 2}
        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            futs = [ex.submit(_post, tiny_server, "/sample", req) for _ in range(4)]
            outs = [f.result() for f in futs]
    finally:
        serve._run_group = orig
        serve.S.scheduler = None
    assert all(len(o["pdbs"]) == 2 for o in outs)
    assert sum(calls) == 8  # all rows ran
    assert max(calls) > 2   # at least one call merged multiple requests


def test_make_group_sampler_routing(tiny_server, monkeypatch):
    """`_make_group_sampler` is the ONE construction rule shared by the
    `--warmup` path and `_run_group` — pin its routing: --tp -> the 2-D TP
    sampler; --dp with a Pallas profile -> the manual shard_map path (a
    plain make_sampler cannot even lower on a Pallas-profile pod: Mosaic
    partitioning raise); --dp with the XLA profile -> automatic SPMD;
    single chip -> the plain sampler with the B=64 microbatch optimum."""
    import types

    import pepflowww_tpu.sampling as sampling
    from pepflowww_tpu.parallel.mesh import make_mesh
    from pepflowww_tpu.parallel.tp import make_mesh_2d

    calls = []
    monkeypatch.setattr(sampling, "make_tp_sampler",
                        lambda *a, **k: calls.append("tp") or "tp")
    monkeypatch.setattr(sampling, "make_best_dp_sampler",
                        lambda *a, **k: calls.append("best_dp") or "best_dp")
    monkeypatch.setattr(sampling, "make_sampler",
                        lambda *a, **k: calls.append(("plain", k.get("microbatch")))
                        or "plain")

    old = (serve.S.mesh, serve.S.args)
    try:
        serve.S.mesh, serve.S.args = make_mesh_2d(4, 2), types.SimpleNamespace(tp=2)
        assert serve._make_group_sampler(100) == "tp"
        serve.S.mesh, serve.S.args = make_mesh(), types.SimpleNamespace(tp=0)
        assert serve._make_group_sampler(100) == "best_dp"
        serve.S.mesh, serve.S.args = None, None
        assert serve._make_group_sampler(100) == "plain"
    finally:
        serve.S.mesh, serve.S.args = old
    assert calls == ["tp", "best_dp", ("plain", 64)]


def test_warmup_sizes_cover_every_reachable_group_pad():
    """--warmup must compile EVERY padded size the scheduler can produce.

    Regression for a measured production incident: warming only the
    endpoint sizes {8, 64} left the intermediate power-of-two pads (16, 32)
    to compile mid-traffic — a 32-client load test stalled 32 s + 45 s
    behind those compiles (p50 51 s vs 6.2 s with the full ladder warm).
    The guard: over every real group size from the single-request floor (8)
    to the merge cap (64 x n_dev), _pad_rule's output must be a member of
    warmup_sizes(n_dev) — including non-power-of-two device counts, where
    doubling a rounded size diverges from rounding a doubled power of two.
    """
    for n_dev in (1, 2, 4, 8, 6):
        warmed = set(serve.warmup_sizes(n_dev))
        for n_real in range(8, 64 * n_dev + 1):
            pad = serve._pad_rule(n_real, n_dev)
            assert pad in warmed, (n_dev, n_real, pad, sorted(warmed))
    # The single-chip ladder is exactly the sizes the incident implicated.
    assert serve.warmup_sizes(1) == [8, 16, 32, 64]
    # Each warmed size must be its own fixed point (no pad-of-pad drift):
    # _run_group(warm rows) must hit the same sampler key requests hit.
    for n_dev in (1, 2, 4, 8, 6):
        for n in serve.warmup_sizes(n_dev):
            assert serve._pad_rule(n, n_dev) == n, (n_dev, n)

#!/usr/bin/env python
"""Peptide-design inference server.

Loads the FlowModel once, pre-compiles samplers for the configured length
buckets, and serves full-atom peptide codesign over HTTP — a serving surface
the reference does not have (its inference is batch scripts only).

Endpoints:
    GET  /healthz             -> {"status": "ok", "device": ...}
    POST /sample              -> generated peptides for one pocket
        request JSON:
            pocket_pdb:   str   PDB text of the receptor pocket
            peptide_pdb:  str   (optional) native peptide PDB; its length and
                                centroid define the generation task. If
                                absent, `peptide_len` must be given and the
                                pocket centroid seeds the placement.
            peptide_len:  int   (optional, default 12)
            num_samples:  int   (default 8)
            num_steps:    int   (default 100)
            seed:         int   (default 0)
        response JSON:
            pdbs: [str]         generated full-atom complexes
            metrics: {ca_rmsd, aar, tm_score}   (vs native peptide if given)

Usage:
    python serve.py --ckpt logs/run/checkpoints/20000 --port 8300
    python serve.py --synthetic_weights --port 8300   # random weights (smoke)
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Server(ThreadingHTTPServer):
    """socketserver's default listen backlog is 5; a client pool that opens
    its connections simultaneously (tools/serve_loadtest.py at 32 clients)
    overflows that accept queue and gets connection resets before the
    handler ever runs. 128 covers any realistic pool; accepted connections
    still queue in the scheduler, which is where admission control lives."""

    request_queue_size = 128


class _State:
    model = None
    params = None
    samplers = {}
    lock = threading.Lock()
    args = None
    scheduler = None
    #: 1-D `data` mesh when serving data-parallel over all local chips
    #: (`--dp`); params replicate, merged request batches shard on axis 0.
    mesh = None


S = _State()


class BatchScheduler:
    """Cross-request batching: concurrent /sample requests whose complexes
    fall in the same (length-bucket, num_steps) group are padded to the bucket
    and run as one device call — the TPU sees B≈max_batch regardless of how
    clients chop their requests.

    Execution is `inflight`-deep (default 2): while one group's results are
    being post-processed on the host (full-atom reconstruction, PDB strings,
    metrics — ~1-2 s at B=64), the next group's device call is already
    dispatched, so the accelerator never idles behind host work under
    sustained load. Device calls themselves serialize on the chip's queue."""

    def __init__(self, run_group, max_batch: int = 64, max_wait_ms: float = 25.0,
                 inflight: int = 2):
        import collections
        import concurrent.futures
        import threading as th

        self.run_group = run_group
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.cv = th.Condition()
        self.pending = collections.defaultdict(list)  # group_key -> [entry]
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=max(1, inflight))
        th.Thread(target=self._worker, daemon=True).start()

    def submit(self, group_key, rows, context):
        """Queue `rows` (list of item dicts, all padded to the group's bucket)
        and block until results for this request are ready."""
        import threading as th

        entry = {"rows": rows, "context": context, "event": th.Event(),
                 "result": None, "error": None}
        with self.cv:
            self.pending[group_key].append(entry)
            self.cv.notify()
        entry["event"].wait()
        if entry["error"] is not None:
            raise entry["error"]
        return entry["result"]

    def _worker(self):
        import time as _time

        while True:
            with self.cv:
                while not self.pending:
                    self.cv.wait()
                # Give other requests a short window to join the batch.
                self.cv.wait(timeout=self.max_wait)
                group_key = max(
                    self.pending, key=lambda k: sum(len(e["rows"]) for e in self.pending[k])
                )
                entries = self.pending.pop(group_key)
            batch_entries = []
            count = 0
            for e in entries:
                if count + len(e["rows"]) > self.max_batch and batch_entries:
                    with self.cv:  # push overflow back
                        self.pending[group_key].append(e)
                        self.cv.notify()
                    continue
                batch_entries.append(e)
                count += len(e["rows"])
            # hand off to the inflight pool so the NEXT group can dispatch
            # while this one post-processes on the host
            self._pool.submit(self._execute, group_key, batch_entries)

    def _execute(self, group_key, batch_entries):
        try:
            all_rows = [r for e in batch_entries for r in e["rows"]]
            results = self.run_group(group_key, all_rows,
                                     [e["context"] for e in batch_entries])
            offset = 0
            for e in batch_entries:
                n = len(e["rows"])
                e["result"] = results[offset : offset + n]
                offset += n
                e["event"].set()
        except Exception as err:  # noqa: BLE001 — propagate per request
            for e in batch_entries:
                e["error"] = err
                e["event"].set()


def _build_item(req: dict):
    from pepflowww_tpu import constants as C
    from pepflowww_tpu.data.pdb import parse_pdb_atoms, parse_pdb
    from pepflowww_tpu.data.dataset import preprocess_structure
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        with open(os.path.join(tmp, "pocket.pdb"), "w") as f:
            f.write(req["pocket_pdb"])
        if req.get("peptide_pdb"):
            with open(os.path.join(tmp, "peptide.pdb"), "w") as f:
                f.write(req["peptide_pdb"])
            item = preprocess_structure({"id": "query", "pdb_path": tmp})
            if item is None:
                raise ValueError("failed to parse pocket/peptide PDBs")
            return item

        # No native peptide: synthesize an extended-chain placeholder of the
        # requested length at the pocket centroid; it only seeds shapes/masks
        # (the sampler replaces everything in the generated region).
        pocket, _ = parse_pdb(os.path.join(tmp, "pocket.pdb"))
        if pocket is None:
            raise ValueError("failed to parse pocket PDB")
        pep_len = int(req.get("peptide_len", 12))
        from pepflowww_tpu.data.synthetic import make_complex

        rng = np.random.default_rng(int(req.get("seed", 0)))
        synth = make_complex(rng, pep_len=pep_len, rec_len=1)
        pep_mask = synth["generate_mask"]
        center = pocket["pos_heavyatom"][:, C.BBHeavyAtom.CA].mean(axis=0)
        pocket = dict(pocket)
        pocket["pos_heavyatom"] = pocket["pos_heavyatom"] - center
        pocket["chain_nb"] = pocket["chain_nb"] + 1
        from pepflowww_tpu.data.dataset import _torsions

        pocket["torsion_angle"], pocket["torsion_angle_mask"] = _torsions(
            pocket["pos_heavyatom"], pocket["aa"]
        )
        item = {"id": "query"}
        item["generate_mask"] = np.concatenate(
            [np.zeros(len(pocket["aa"]), dtype=bool), np.ones(pep_len, dtype=bool)]
        )
        for k in pocket:
            if isinstance(pocket[k], np.ndarray):
                item[k] = np.concatenate([pocket[k], synth[k][pep_mask]], axis=0)
            elif isinstance(pocket[k], list):
                item[k] = pocket[k] + [x for x, m in zip(synth[k], pep_mask) if m]
        return item


_KEY_COUNTER = [0]


def _make_group_sampler(steps: int):
    """The ONE sampler-construction rule, shared by `_run_group` and the
    `--warmup` path (they previously diverged: warmup under --dp built a
    plain `make_sampler`, which on a real multi-chip mesh with the Pallas
    profile hits jax's Mosaic partitioning raise AND caches a different
    program than requests would build).

    Under --tp: the 2-D (data, model) sampler. Under --dp: profile-aware —
    the Pallas profile takes the manual shard_map path (keeps the fused
    kernels per chip, sampling.make_best_dp_sampler docstring), the XLA
    profile takes automatic SPMD. Single chip: the plain sampler with the
    B=64 microbatch optimum (PERF.md batch sweep).
    """
    from pepflowww_tpu import sampling

    if S.mesh is not None and getattr(S.args, "tp", 0):
        return sampling.make_tp_sampler(S.model, S.mesh, num_steps=steps)
    if S.mesh is not None:
        # No microbatch chunking under --dp: the scheduler's merge cap is
        # already 64 x n_devices (the per-chip optimum) and the sharded
        # inputs make the one program SPMD over the mesh.
        return sampling.make_best_dp_sampler(S.model, S.mesh, num_steps=steps)
    return sampling.make_sampler(S.model, num_steps=steps, microbatch=64)


def _pad_rule(n_real: int, n_dev: int) -> int:
    """Padded device-batch size for a merged group of `n_real` rows.

    n_dev x (power of two), so compiled programs are bounded per
    (bucket, steps) and the batch shards evenly on a mesh; extra rows
    replicate the last item and are discarded from the results. For a
    power-of-two device count this is exactly "next power of two >= n_real";
    the general form is used because it is IDEMPOTENT for every n_dev —
    pad(pad(n)) == pad(n) — which `warmup_sizes` and the warm-key test rely
    on (the earlier "pow2 then round up to a device multiple" rule was not:
    with n_dev=6, 8 rows padded to 12 but 12 rows padded to 18, so warming
    a 12-row group compiled the 18-row program and left 12 cold)."""
    per_dev = 1
    while per_dev * n_dev < n_real:
        per_dev *= 2
    return per_dev * n_dev


def _group_pad_size(n_real: int) -> int:
    return _pad_rule(n_real, S.mesh.devices.size if S.mesh is not None else 1)


def warmup_sizes(n_dev: int, cap_per_dev: int = 64, floor: int = 8) -> list:
    """Every padded group size the scheduler can produce under load — the
    image of `_pad_rule` over real group sizes from the single-request floor
    to the merge cap. `--warmup` compiles all of them: any size reachable by
    `_run_group` but not warmed compiles mid-traffic with every queued
    client waiting behind it (measured cost in main()'s warmup comment)."""
    cap = cap_per_dev * n_dev
    return sorted({_pad_rule(n, n_dev) for n in range(min(floor, cap), cap + 1)})


def _run_group(group_key, rows, contexts):
    """Execute one merged device batch; returns one result dict per row."""
    import jax
    import jax.numpy as jnp

    from pepflowww_tpu import metrics as M
    from pepflowww_tpu.data.collate import device_batch, pad_and_collate
    from pepflowww_tpu.data.pdb import save_pdb
    from pepflowww_tpu.inference import reconstruct_full_atom_outputs, _chain_letters

    bucket, steps = group_key
    n_real = len(rows)
    n_padded = _group_pad_size(n_real)
    rows = rows + [rows[-1]] * (n_padded - n_real)
    batch_np = pad_and_collate(rows, pad_to=bucket)
    batch = {k: jnp.asarray(v) for k, v in device_batch(batch_np).items()}
    if S.mesh is not None:
        from pepflowww_tpu.parallel.mesh import shard_batch

        batch = shard_batch(batch, S.mesh)

    with S.lock:
        skey = (bucket, n_padded, steps)
        if skey not in S.samplers:
            # Shared construction rule (also used by --warmup); the padded
            # batch is already a device multiple (above).
            S.samplers[skey] = _make_group_sampler(steps)
        fn = S.samplers[skey]
        _KEY_COUNTER[0] += 1
        key = jax.random.PRNGKey(_KEY_COUNTER[0])

    import time as _time

    t0 = _time.perf_counter()
    out = fn(S.params, batch, key)
    # jax dispatch is async — force the fetch so the timing split below is
    # honest (np.asarray, not block_until_ready: axon tunnel trap, CLAUDE.md)
    out = {k: np.asarray(v) for k, v in out.items()}
    t1 = _time.perf_counter()
    m = M.evaluate_sample(out, batch)
    t2 = _time.perf_counter()
    pos15, mask15 = reconstruct_full_atom_outputs(out, batch_np)
    t3 = _time.perf_counter()
    seqs = np.asarray(out["seqs"])
    res_mask = np.asarray(batch_np["res_mask"]).astype(bool)
    results = []
    for b in range(n_real):
        sel = res_mask[b]
        pdb = save_pdb({
            "aa": seqs[b][sel],
            "pos_heavyatom": pos15[b][sel],
            "mask_heavyatom": mask15[b][sel],
            "chain_nb": np.asarray(batch_np["chain_nb"])[b][sel],
            "resseq": np.asarray(batch_np["resseq"])[b][sel],
            "chain_id": _chain_letters(np.asarray(batch_np["chain_nb"])[b][sel]),
            "icode": [" "] * int(sel.sum()),
        })
        results.append({
            "pdb": pdb,
            "ca_rmsd": float(m["ca_rmsd"][b]),
            "aar": float(m["aar"][b]),
            "tm_score": float(m["tm_score"][b]),
        })
    t4 = _time.perf_counter()
    print(f"[serve] group bucket={bucket} n={n_real}/{n_padded} steps={steps} "
          f"sample={t1 - t0:.2f}s metrics={t2 - t1:.2f}s rebuild={t3 - t2:.2f}s "
          f"pdb={t4 - t3:.2f}s", flush=True)
    return results


def _sample(req: dict) -> dict:
    from pepflowww_tpu.data.collate import bucket_length, replicate_item

    item = _build_item(req)
    n = int(req.get("num_samples", 8))
    steps = int(req.get("num_steps", 100))
    bucket = bucket_length(len(item["aa"]))

    with S.lock:
        # under the lock: two concurrent first requests must not each build
        # a scheduler (the loser's worker thread would linger and split
        # cross-request batching between two queues)
        if S.scheduler is None:
            n_dev = S.mesh.devices.size if S.mesh is not None else 1
            S.scheduler = BatchScheduler(_run_group, max_batch=64 * n_dev)
    rows = replicate_item(item, n)
    per_row = S.scheduler.submit((bucket, steps), rows, req)
    return {
        "pdbs": [r["pdb"] for r in per_row],
        "metrics": {
            "ca_rmsd": [r["ca_rmsd"] for r in per_row],
            "aar": [r["aar"] for r in per_row],
            "tm_score": [r["tm_score"] for r in per_row],
        },
    }


class Handler(BaseHTTPRequestHandler):
    def _json(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            import jax

            self._json(200, {"status": "ok", "device": str(jax.devices()[0])})
        else:
            self._json(404, {"error": "unknown path"})

    def do_POST(self):
        if self.path != "/sample":
            self._json(404, {"error": "unknown path"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            self._json(200, _sample(req))
        except Exception as e:  # noqa: BLE001 — server boundary
            self._json(400, {"error": f"{e.__class__.__name__}: {e}"})

    def log_message(self, fmt, *args):
        print("[serve]", fmt % args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/learn_angle.yaml")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--torch_ckpt", default=None)
    ap.add_argument("--synthetic_weights", action="store_true")
    ap.add_argument("--port", type=int, default=8300)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--warmup", default=None,
                    help="comma-separated length buckets to precompile at "
                         "startup (e.g. '64,96'); first requests then skip "
                         "the ~60 s compile")
    ap.add_argument("--dp", action="store_true",
                    help="serve data-parallel over all local chips: merged "
                         "request batches shard across a 1-D mesh (the "
                         "scheduler's merge cap scales to 64 x n_devices), "
                         "params replicate — mass-serving scale-out")
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel factor: serve on a 2-D (data, "
                         "model) mesh with the L² pair tensors row-sharded "
                         "over this many devices (parallel/tp.py) — for "
                         "model widths / pocket lengths whose pair "
                         "activations exceed one chip's HBM; remaining "
                         "devices stay data-parallel")
    args = ap.parse_args()
    S.args = args

    import jax
    import jax.numpy as jnp

    from pepflowww_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    from pepflowww_tpu.data.collate import device_batch
    from pepflowww_tpu.data.synthetic import make_batch
    from pepflowww_tpu.models.flow import FlowModel
    from pepflowww_tpu.training.config import load_config

    model_cfg, cfg, _ = load_config(args.config)
    S.model = FlowModel(model_cfg)
    rng = np.random.default_rng(0)
    example = device_batch(make_batch(rng, batch_size=2, pep_len=8, rec_len=24, pad_to=32))
    example = {k: jnp.asarray(v) for k, v in example.items()}
    key = jax.random.PRNGKey(0)
    S.params = jax.jit(S.model.init)({"params": key, "corruption": key}, example)["params"]
    if args.torch_ckpt:
        from pepflowww_tpu.convert import load_torch_checkpoint

        S.params = load_torch_checkpoint(args.torch_ckpt)
    elif args.ckpt:
        from pepflowww_tpu.training import checkpoints as ckpt_lib
        from pepflowww_tpu.training.optim import make_optimizer

        tx = make_optimizer(dict(cfg.train["optimizer"]), cfg.train["max_grad_norm"])
        restored = ckpt_lib.restore_checkpoint(
            args.ckpt, {"params": S.params, "opt_state": tx.init(S.params),
                        "scheduler": {"best": 0.0, "num_bad": 0}, "iteration": 0}
        )
        S.params = restored["params"]
    elif not args.synthetic_weights:
        print("[serve] WARNING: no checkpoint given; serving random weights")

    if args.tp:
        from pepflowww_tpu.parallel.mesh import replicate
        from pepflowww_tpu.parallel.tp import make_mesh_2d

        n_dev = len(jax.devices())
        assert n_dev % args.tp == 0, (n_dev, args.tp)
        S.mesh = make_mesh_2d(n_dev // args.tp, args.tp)
        S.params = replicate(S.params, S.mesh)
        print(f"[serve] tensor-parallel ({n_dev // args.tp}x{args.tp} mesh)")
    elif args.dp:
        from pepflowww_tpu.parallel.mesh import make_mesh, replicate

        S.mesh = make_mesh()
        S.params = replicate(S.params, S.mesh)
        print(f"[serve] data-parallel over {S.mesh.devices.size} devices")

    if args.warmup:
        import time as _time

        from pepflowww_tpu.data.collate import replicate_item
        from pepflowww_tpu.data.synthetic import make_complex

        # Warm by driving _run_group itself — the EXACT code path requests
        # take — at EVERY padded group size the scheduler can produce under
        # load: the full power-of-two ladder from the single-request size
        # (8, the p50 of idle traffic) up to the merge cap (64 × n_dev).
        # Warming only the endpoints is not enough: _run_group pads each
        # merged group to the next power of two, so partially-merged groups
        # hit the INTERMEDIATE sizes, and each unwarmed size compiles
        # mid-traffic with every queued client waiting behind it (measured,
        # 32-client load test: endpoints-only warm left n=16/n=32 cold —
        # 32 s + 45 s stalls, p50 51 s / 4.8 peptides/s; with every ladder
        # shape warm the same test runs p50 6.2 s / 40.8 peptides/s, every
        # group at 0.3-0.7 s). Driving _run_group also compiles the
        # jitted full-atom rebuild and fills S.samplers under the same keys
        # requests will hit.
        n_dev = S.mesh.devices.size if S.mesh is not None else 1
        for bucket in (int(b) for b in args.warmup.split(",")):
            item = make_complex(rng, pep_len=8, rec_len=max(bucket - 24, 8))
            for n in warmup_sizes(n_dev):
                t0 = _time.time()
                _run_group((bucket, 100), replicate_item(item, n), [None])
                print(f"[serve] warmed bucket {bucket} n={n} "
                      f"(100 steps, {_time.time() - t0:.0f}s)")

    server = _Server((args.host, args.port), Handler)
    print(f"[serve] listening on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

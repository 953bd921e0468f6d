"""PepMerge-style peptide–pocket dataset: preprocessing + loading.

Mirrors `models_con/pep_dataloader.py` from the reference:

* each complex lives in `<structure_dir>/<id>/{peptide.pdb,pocket.pdb}`
* both structures are centered on the peptide CA centroid; torsions are
  computed after centering (pep_dataloader.py:50-58)
* peptide length restricted to [3, 25] (:53); receptor chain_nb += 1 (:59)
* item = receptor ‖ peptide with generate_mask marking the peptide (:63-70)
* ids listed in an exclusion file (the test-split names.txt) are dropped from
  the training cache (:36-45)

The cache is a RecordStore instead of LMDB; preprocessing fans out over a
process pool (joblib, as in the reference :163-168).
"""

from __future__ import annotations

import logging
import os
from typing import Iterator, Optional, Sequence

import numpy as np

from pepflowww_tpu.data import recordstore
from pepflowww_tpu.data.collate import (DEFAULT_BUCKETS, bucket_length,
                                        device_batch, pad_and_collate)
from pepflowww_tpu.data.pdb import parse_pdb
from pepflowww_tpu import constants as C

logger = logging.getLogger(__name__)


def _torsions(pos15: np.ndarray, aa: np.ndarray):
    import jax
    import jax.numpy as jnp

    from pepflowww_tpu.ops import allatom

    # Preprocessing is host-side work: pin to the CPU backend so it never
    # round-trips the accelerator.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        tor, mask = jax.jit(allatom.get_torsion_angles)(
            jnp.asarray(pos15)[None], jnp.asarray(aa)[None]
        )
        return np.asarray(tor)[0].astype(np.float32), np.asarray(mask)[0]


def preprocess_structure(task: dict, exclude: Sequence[str] = ()) -> Optional[dict]:
    """One complex -> preprocessed item dict, or None on failure."""
    try:
        if task["id"] in exclude:
            raise ValueError(f'{task["id"]} in exclusion list')
        pdb_path = task["pdb_path"]
        pep, _ = parse_pdb(os.path.join(pdb_path, "peptide.pdb"))
        if pep is None:
            raise ValueError("empty peptide")
        ca_mask = pep["mask_heavyatom"][:, C.BBHeavyAtom.CA]
        # keep float32: the python-scalar epsilon would promote the division
        # (and then every downstream position array) to float64
        center = (
            pep["pos_heavyatom"][ca_mask, C.BBHeavyAtom.CA].sum(axis=0)
            / np.float32(ca_mask.sum() + 1e-8)
        ).astype(np.float32)
        pep["pos_heavyatom"] = pep["pos_heavyatom"] - center[None, None, :]
        pep["torsion_angle"], pep["torsion_angle_mask"] = _torsions(
            pep["pos_heavyatom"], pep["aa"]
        )
        if len(pep["aa"]) < 3 or len(pep["aa"]) > 25:
            raise ValueError("peptide length not in [3,25]")

        rec, _ = parse_pdb(os.path.join(pdb_path, "pocket.pdb"))
        if rec is None:
            raise ValueError("empty pocket")
        rec["pos_heavyatom"] = rec["pos_heavyatom"] - center[None, None, :]
        rec["torsion_angle"], rec["torsion_angle_mask"] = _torsions(
            rec["pos_heavyatom"], rec["aa"]
        )
        rec["chain_nb"] = rec["chain_nb"] + 1

        data = {"id": task["id"]}
        data["generate_mask"] = np.concatenate(
            [np.zeros(len(rec["aa"]), dtype=bool), np.ones(len(pep["aa"]), dtype=bool)]
        )
        for k in rec.keys():
            if isinstance(rec[k], np.ndarray):
                data[k] = np.concatenate([rec[k], pep[k]], axis=0)
            elif isinstance(rec[k], list):
                data[k] = rec[k] + pep[k]
            else:
                raise ValueError(f"Unknown field type for {k}")
        return data
    except (KeyError, ValueError, TypeError, OSError) as e:
        logger.warning("[%s] %s: %s", task.get("id"), e.__class__.__name__, e)
        return None


class PepDataset:
    """Preprocess-once, read-many dataset over a RecordStore cache."""

    def __init__(
        self,
        structure_dir: str,
        dataset_dir: str,
        name: str = "pep",
        reset: bool = False,
        exclude_names_file: Optional[str] = None,
        n_jobs: Optional[int] = None,
    ):
        self.structure_dir = structure_dir
        self.dataset_dir = dataset_dir
        self.name = name
        self._store: Optional[recordstore.RecordStore] = None

        self.exclude = []
        if exclude_names_file and os.path.exists(exclude_names_file):
            with open(exclude_names_file) as f:
                self.exclude = [line.strip() for line in f if line.strip()]

        cache = self._cache_path
        if reset and recordstore.exists(cache):
            os.remove(cache)
            os.remove(cache + ".idx")
            if os.path.exists(cache + ".lens.json"):
                os.remove(cache + ".lens.json")
        if not recordstore.exists(cache):
            self._preprocess(n_jobs=n_jobs)

    @property
    def _cache_path(self) -> str:
        return os.path.join(self.dataset_dir, f"{self.name}_structure_cache.rec")

    def _preprocess(self, n_jobs: Optional[int] = None):
        os.makedirs(self.dataset_dir, exist_ok=True)
        all_pdbs = sorted(os.listdir(self.structure_dir))
        tasks = [
            {"id": name, "pdb_path": os.path.join(self.structure_dir, name)}
            for name in all_pdbs
            if os.path.isdir(os.path.join(self.structure_dir, name))
        ]
        import joblib

        n_jobs = n_jobs or max(joblib.cpu_count() // 2, 1)
        results = joblib.Parallel(n_jobs=n_jobs)(
            joblib.delayed(preprocess_structure)(t, tuple(self.exclude)) for t in tasks
        )
        with recordstore.RecordStoreWriter(self._cache_path) as w:
            for data in results:
                if data is None:
                    continue
                w.put(data["id"], data)

    def _connect(self) -> recordstore.RecordStore:
        if self._store is None:
            self._store = recordstore.RecordStore(self._cache_path)
        return self._store

    def __len__(self) -> int:
        return len(self._connect())

    def __getitem__(self, i: int) -> dict:
        return self._connect()[i]

    @property
    def ids(self):
        return self._connect().keys

    @property
    def lengths(self) -> np.ndarray:
        """Per-item residue counts (pocket+peptide), for length bucketing.

        Computed once per cache and persisted to a `.lens.json` sidecar so
        later epochs/processes don't re-decompress the whole store.
        """
        if getattr(self, "_lengths", None) is not None:
            return self._lengths
        import json

        store = self._connect()
        sidecar = self._cache_path + ".lens.json"
        # Stamp the store file's identity into the sidecar: a cache rebuilt
        # with the same ids but different contents (e.g. changed
        # preprocessing without --reset) must invalidate the cached lengths,
        # not just a changed key set (ADVICE r2).
        st = os.stat(self._cache_path)
        stamp = [int(st.st_size), int(st.st_mtime_ns)]
        try:
            with open(sidecar) as f:
                d = json.load(f)
            if (
                isinstance(d, dict)
                and d.get("__store__") == stamp
                and set(d.get("lens", {}).keys()) == set(store.keys)
            ):
                self._lengths = np.array(
                    [d["lens"][k] for k in store.keys], dtype=np.int64
                )
                return self._lengths
        except (OSError, json.JSONDecodeError):
            pass  # absent, unreadable, or mid-write by another process
        self._lengths = np.array(
            [len(store.get(k)["aa"]) for k in store.keys], dtype=np.int64
        )
        tmp = sidecar + f".tmp.{os.getpid()}"
        try:
            # write-to-temp + rename: concurrent readers (multi-host loaders
            # on a shared filesystem) never observe a partial file
            with open(tmp, "w") as f:
                json.dump(
                    {"__store__": stamp,
                     "lens": {k: int(n) for k, n in zip(store.keys, self._lengths)}},
                    f,
                )
            os.replace(tmp, sidecar)
        except OSError:
            try:
                os.remove(tmp)
            except OSError:
                pass
        return self._lengths


class DataLoader:
    """Length-bucketed, shuffled batch iterator yielding numpy device batches.

    Replaces torch DataLoader + PaddingCollate + DistributedSampler
    (`pepflow/utils/data.py:19-78`, `train_ddp.py:85`). The reference pads each
    mixed-length batch to the batch max; here shuffled indices are grouped by
    length *bucket* first, so (a) every batch pads only to its own bucket
    boundary (bounded padding waste) and (b) the number of distinct compiled
    shapes is bounded by the bucket list.

    Multi-host determinism: every shard derives the same global batch plan
    from the shared seed (bucket -> global batches of batch_size*num_shards),
    then takes its stride of each global batch — so all hosts see the same
    padded shape at the same step (required for lock-step pjit programs).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        drop_last: bool = True,
        pad_to: Optional[int] = None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        bucket_by_length: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last
        self.pad_to = pad_to
        self.buckets = buckets
        # A fixed pad_to already implies a single compiled shape; bucketing
        # only applies when the pad target is derived from the data.
        self.bucket_by_length = bucket_by_length and pad_to is None
        self._epoch = 0
        self._lens: Optional[np.ndarray] = None

    def _lengths(self) -> np.ndarray:
        if self._lens is None:
            lens = getattr(self.dataset, "lengths", None)
            if lens is None:
                lens = [len(self.dataset[i]["aa"]) for i in range(len(self.dataset))]
            self._lens = np.asarray(lens, dtype=np.int64)
        return self._lens

    def _batch_plan(self) -> list:
        """[(pad_to, global_index_list)] for this epoch, same on all shards."""
        n = len(self.dataset)
        order = np.arange(n)
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1

        gbs = self.batch_size * self.num_shards
        # With >1 shard a ragged tail can't split evenly; always drop it then.
        drop_last = self.drop_last or self.num_shards > 1

        if not self.bucket_by_length:
            end = len(order) - (len(order) % gbs) if drop_last else len(order)
            return [
                (self.pad_to, order[i : i + gbs].tolist())
                for i in range(0, end, gbs)
                if i < end
            ]

        lengths = self._lengths()
        groups: dict = {}
        for idx in order.tolist():
            b = bucket_length(int(lengths[idx]), self.buckets)
            groups.setdefault(b, []).append(idx)
        plan = []
        for b in sorted(groups):
            g = groups[b]
            end = len(g) - (len(g) % gbs) if drop_last else len(g)
            for i in range(0, end, gbs):
                plan.append((b, g[i : i + gbs]))
        if self.shuffle:
            rng.shuffle(plan)
        return plan

    def __iter__(self) -> Iterator[dict]:
        for pad_to, idxs in self._batch_plan():
            # CONTIGUOUS block per shard (not strided): under multi-host SPMD
            # the global batch is assembled from process-local rows with
            # P("data") row-block ownership (mesh.shard_batch), so shard i
            # holding rows [i*bs, (i+1)*bs) makes the global row order equal
            # to the single-process plan order — loss trajectories match a
            # single-process run with the same global batch exactly
            # (tests/test_multihost.py pins this).
            lo = self.shard_index * self.batch_size
            mine = idxs[lo : lo + self.batch_size]
            if len(mine) == 0:
                continue
            items = [self.dataset[int(j)] for j in mine]
            yield device_batch(pad_and_collate(items, pad_to=pad_to))

    def infinite(self) -> Iterator[dict]:
        while True:
            yield from iter(self)

    def prefetch(self, depth: int = 2) -> Iterator[dict]:
        """Infinite iterator with a background collate thread.

        Replaces torch DataLoader's worker processes: the accelerator step and
        the host-side fetch/pad of the next batch overlap, bounded by `depth`
        in-flight batches.
        """
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = threading.Event()

        def producer():
            it = self.infinite()
            while not stop.is_set():
                try:
                    q.put(next(it), timeout=0.5)
                except queue.Full:
                    continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()

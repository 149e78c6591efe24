"""Real multi-process DDP consumer tests (reference
``tests/test_ddp_real.py:210-296``): the reference's strongest invariant
suite spawns actual OS processes per rank and asserts no-overlap /
full-coverage of the sample stream.  Here the same invariants are
checked across BOTH export paths:

1. ``spark`` mode — each rank is a separate OS process with its OWN
   SparkSession that independently rebuilds the plan from (seed, epoch)
   and applies ``ddp_filter``.  Disjointness+completeness across
   independently-built plans is the determinism claim: no communication
   beyond the seed.

2. ``files`` mode — ranks are Spark-free consumer processes (pyarrow
   only) reading their round-robin share of ``write_epoch_plan``
   parquet / ``write_arrow_fetches`` Arrow-IPC files — the trainer-side
   contract of the scale export path.

``resolve_epoch_seed(None)`` under a real gloo process group is covered
when torch is installed (gated — torch is not in this container).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from scdataset_spark.operators.strategies import BlockShuffling
from scdataset_spark.pipeline.export import write_arrow_fetches, write_epoch_plan
from scdataset_spark.plans.plan import exact_num_batches, with_batches

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_ddp_worker.py")

N = 1000
SEED = 20240817
BLOCK = 16
BATCH = 8
FETCH_FACTOR = 4  # fetch = 32 rows -> 32 fetches, uneven across ranks


def _spawn(cfg: dict) -> None:
    proc = subprocess.run(
        [sys.executable, WORKER, json.dumps(cfg)],
        cwd=os.path.dirname(os.path.dirname(WORKER)),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"rank {cfg['rank']} failed:\n{proc.stderr[-2000:]}"


class TestMultiProcessDDP:
    def test_independent_processes_build_disjoint_exhaustive_shares(
        self, spark, tmp_path
    ):
        """Two OS processes, two SparkSessions, zero communication: both
        rebuild the epoch plan from the seed alone; their ddp_filter
        shares must tile the full plan exactly once and hit the
        closed-form exact_num_batches per rank."""
        world = 2
        fixture = str(tmp_path / "fixture")
        spark.range(N).selectExpr(
            "id AS row_id", "id * 3 AS payload"
        ).write.parquet(fixture)

        outs = []
        for rank in range(world):  # sequential: one child JVM at a time
            out = str(tmp_path / f"rank_{rank}.json")
            _spawn(
                {
                    "mode": "spark",
                    "fixture": fixture,
                    "out": out,
                    "rank": rank,
                    "world": world,
                    "seed": SEED,
                    "block_size": BLOCK,
                    "batch_size": BATCH,
                    "fetch_factor": FETCH_FACTOR,
                }
            )
            outs.append(json.load(open(out)))

        # the parent's own session is the arbiter: same seed, same plan
        df = spark.read.parquet(fixture)
        expected = with_batches(
            BlockShuffling(block_size=BLOCK).plan(df, seed=SEED, epoch=0),
            batch_size=BATCH,
            fetch_factor=FETCH_FACTOR,
            drop_last=True,
        )
        exp_rows = sorted(
            [r["fetch_id"], r["batch_id"], r["pos"], r["row_id"]]
            for r in expected.select(
                "fetch_id", "batch_id", "pos", "row_id"
            ).collect()
        )

        seen: list[list[int]] = []
        for o in outs:
            # each row landed on exactly the rank its fetch_id maps to
            assert all(r[0] % world == o["rank"] for r in o["rows"])
            # per-rank batch count == closed-form __len__ contract
            n_batches = len({(r[0], r[1]) for r in o["rows"]})
            assert n_batches == exact_num_batches(
                N, BATCH, FETCH_FACTOR, drop_last=True,
                world_size=world, rank=o["rank"],
            )
            seen.extend(o["rows"])
        # exactly-once global coverage: disjoint (no dup rows) + complete
        assert sorted(seen) == exp_rows

    def test_sparkfree_file_consumers_cover_exactly_once(self, spark, tmp_path):
        """Four Spark-free pyarrow consumer processes over one
        write_epoch_plan + write_arrow_fetches export: round-robin
        shares are pos-sorted within fetch, disjoint, and exhaustive on
        both layouts."""
        world = 4
        df = spark.range(N).selectExpr("id AS row_id", "id * 7 AS payload")
        planned = with_batches(
            BlockShuffling(block_size=BLOCK).plan(df, seed=SEED, epoch=0),
            batch_size=BATCH,
            fetch_factor=FETCH_FACTOR,
        )
        plan_dir = str(tmp_path / "epoch_plan")
        arrow_dir = str(tmp_path / "arrow")
        write_epoch_plan(
            planned.select("fetch_id", "batch_id", "pos", "row_id", "payload"),
            plan_dir,
            columns=["batch_id", "row_id", "payload"],
        )
        write_arrow_fetches(
            planned, arrow_dir, columns=["pos", "row_id", "payload"]
        ).collect()

        procs = []
        for rank in range(world):  # concurrent: no JVM in these children
            out = str(tmp_path / f"consumer_{rank}.json")
            cfg = {
                "mode": "files",
                "plan_dir": plan_dir,
                "arrow_dir": arrow_dir,
                "out": out,
                "rank": rank,
                "world": world,
            }
            procs.append(
                (
                    out,
                    rank,
                    subprocess.Popen(
                        [sys.executable, WORKER, json.dumps(cfg)],
                        stderr=subprocess.PIPE,
                        text=True,
                    ),
                )
            )
        results = []
        for out, rank, p in procs:
            _, err = p.communicate(timeout=120)
            assert p.returncode == 0, f"consumer {rank} failed:\n{err[-2000:]}"
            results.append(json.load(open(out)))

        all_pq: list[int] = []
        all_ar: list[int] = []
        for r in results:
            assert r["sorted_ok"], f"rank {r['rank']} saw unsorted pos in a fetch"
            # batch parity from the files alone (no drop_last here)
            assert len(r["batch_ids"]) == exact_num_batches(
                N, BATCH, FETCH_FACTOR, drop_last=False,
                world_size=world, rank=r["rank"],
            )
            all_pq.extend(r["parquet_row_ids"])
            all_ar.extend(r["arrow_row_ids"])
        assert sorted(all_pq) == list(range(N))  # disjoint + complete
        assert sorted(all_ar) == list(range(N))

    def test_gloo_seed_broadcast(self):
        """resolve_epoch_seed(None) inside an initialized gloo group:
        every rank must see rank 0's seed (reference _init_seed).  Gated
        on torch, which is not baked into this container."""
        pytest.importorskip("torch")
        # Spawn 2 gloo ranks; each returns resolve_epoch_seed(None).
        code = (
            "import json,os,sys,torch.distributed as dist;"
            "sys.path.insert(0, os.getcwd());"
            "from scdataset_spark.plans.plan import resolve_epoch_seed;"
            "dist.init_process_group('gloo', init_method=sys.argv[2],"
            " rank=int(sys.argv[1]), world_size=2);"
            "print(json.dumps(resolve_epoch_seed(None)))"
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            init = f"file://{d}/gloo_init"
            procs = [
                subprocess.Popen(
                    [sys.executable, "-c", code, str(r), init],
                    stdout=subprocess.PIPE,
                    cwd=os.path.dirname(os.path.dirname(WORKER)),
                    text=True,
                )
                for r in range(2)
            ]
            seeds = [json.loads(p.communicate(timeout=120)[0]) for p in procs]
        assert seeds[0] == seeds[1]

"""Vector-index destination (destinations/vector_index.py).

The Airbyte vector-DB destination record shape (upsert-by-id embeddings
+ delete-by-id) maintained under this engine's CDC MERGE semantics,
with a frozen fixed-k IVF codebook, a cell-partitioned published
serving layout, and probed top-k queries. Pins:

- upsert/update/delete convergence: the index live state equals the
  per-id winner rule applied to the full record history,
- codebook freeze: cell ids for unchanged vectors never move across
  upserts (no silent re-train),
- exactly-once: replaying a committed epoch is a no-op,
- publish prunes: a probed query's serving scan reads only the probed
  cells' partition directories,
- query parity: probed top-k == brute-force top-k restricted to the
  same cells, computed independently of the index.
"""

import math
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from airbyte_integrations_spark.destinations.vector_index import VectorIndex


def _vec(i, dim=8, flip=False):
    """Deterministic unit-ish vector for id i; flip reverses it (a
    distinct deterministic embedding for update tests)."""
    v = [math.sin(0.7 * i + 0.3 * j) for j in range(dim)]
    return list(reversed(v)) if flip else v


_REC_SCHEMA = (
    "vec_id long, embedding array<double>, _ab_cdc_lsn long, "
    "_ab_cdc_updated_at timestamp, _ab_cdc_deleted_at timestamp, "
    "_airbyte_ab_id string, _airbyte_emitted_at timestamp"
)

_DEL_TS = __import__("datetime").datetime(2024, 1, 1)


def _records(spark, ids, lsn0=0, flip=False, deleted=()):
    rows = [
        (
            i,
            _vec(i, flip=flip),
            lsn0 + i,
            None,
            _DEL_TS if i in deleted else None,
            f"ab-{lsn0 + i}",
            None,
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, _REC_SCHEMA)


@pytest.fixture()
def index(spark, tmp_path):
    return VectorIndex(spark, str(tmp_path / "vidx"))


def test_upsert_update_delete_converges(spark, index):
    index.upsert(_records(spark, range(40)), epoch=0, k=4)
    # epoch 1: update 5 vectors (reversed embedding, higher lsn),
    # delete 3, insert 2 new ones
    upd = _records(spark, [0, 5, 10, 15, 20], lsn0=1000, flip=True)
    dels = _records(spark, [7, 14, 21], lsn0=2000, deleted={7, 14, 21})
    ins = _records(spark, [100, 101], lsn0=3000)
    index.upsert(upd.unionByName(dels).unionByName(ins), epoch=1)

    live = {r["vec_id"]: r for r in index.table.read_live().collect()}
    assert set(live) == (set(range(40)) - {7, 14, 21}) | {100, 101}
    # updated vectors carry the new embedding (and a cell computed
    # from it), untouched vectors the original
    assert live[5]["embedding"] == pytest.approx(_vec(5, flip=True))
    assert live[6]["embedding"] == pytest.approx(_vec(6))


def test_codebook_frozen_and_cells_stable(spark, index):
    index.upsert(_records(spark, range(30)), epoch=0, k=4)
    cb0 = index.codebook()
    cells0 = {r["vec_id"]: r["cell"] for r in index.table.read_live().collect()}
    index.upsert(_records(spark, range(200, 230), lsn0=5000), epoch=1)
    assert index.codebook() == cb0  # no retrain
    cells1 = {r["vec_id"]: r["cell"] for r in index.table.read_live().collect()}
    for i in range(30):
        assert cells1[i] == cells0[i]


def test_epoch_replay_is_noop(spark, index):
    index.upsert(_records(spark, range(20)), epoch=0, k=4)
    v1 = index.upsert(_records(spark, [0, 1], lsn0=9000, flip=True), epoch=1)
    before = sorted(
        (r["vec_id"], r["_ab_cdc_lsn"]) for r in index.table.read_live().collect()
    )
    v2 = index.upsert(_records(spark, [0, 1], lsn0=9000, flip=True), epoch=1)
    assert v2 == v1
    after = sorted(
        (r["vec_id"], r["_ab_cdc_lsn"]) for r in index.table.read_live().collect()
    )
    assert after == before


def test_publish_prunes_to_probed_cells(spark, index):
    index.upsert(_records(spark, range(60)), epoch=0, k=4)
    index.publish()
    serve = index.serving()
    cells = sorted(r["cell"] for r in serve.select("cell").distinct().collect())
    assert len(cells) >= 2
    probed = cells[:2]
    pruned = serve.filter(F.col("cell").isin([int(c) for c in probed]))
    # inputFiles() ignores partition pruning; the files ACTUALLY read
    # are what input_file_name() surfaces at execution time.
    files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert files, "pruned scan must read something"
    for f in files:
        assert any(f"cell={c}/" in f for c in probed), f
    assert len(files) < len(serve.inputFiles())


def test_query_matches_bruteforce_within_probed_cells(spark, index):
    index.upsert(_records(spark, range(50)), epoch=0, k=4)
    index.upsert(
        _records(spark, [2, 4], lsn0=7000, flip=True)
        .unionByName(_records(spark, [9], lsn0=8000, deleted={9})),
        epoch=1,
    )
    index.publish()
    queries = spark.createDataFrame(
        [Row(qid=i, embedding=_vec(1000 + i)) for i in range(5)]
    )
    got = {
        (r["qid"], r["rank"]): (r["vec_id"], r["sim"])
        for r in index.query(queries, k=3, nprobe=2).collect()
    }

    # independent brute force (python floats == Spark doubles; the
    # floor-scaled sim makes the comparison exact)
    cb = index.codebook()
    serve = index.serving().collect()

    def fcos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(sum(x * y for x, y in zip(a, b)) / (na * nb) * 1000)

    for qi in range(5):
        qv = _vec(1000 + qi)
        ranked_cells = sorted(
            ((fcos(qv, c["cv"]), -c["cent_id"]) for c in cb), reverse=True
        )[:2]
        probe = {-nc for _, nc in ranked_cells}
        cands = [
            (fcos(qv, [float(x) for x in r["embedding"]]), r["vec_id"])
            for r in serve
            if r["cell"] in probe
        ]
        top = sorted(cands, key=lambda t: (-t[0], t[1]))[:3]
        for rank, (sim, vid) in enumerate(top, start=1):
            assert got[(qi, rank)] == (vid, sim)
    # deleted vector never surfaces
    assert all(vid != 9 for vid, _ in got.values())


def test_mor_layout_and_missing_codebook(spark, tmp_path):
    idx = VectorIndex(spark, str(tmp_path / "vmor"))
    with pytest.raises(ValueError):
        idx.codebook()
    idx.upsert(_records(spark, range(25)), epoch=0, k=4, mode="mor")
    idx.upsert(_records(spark, [3, 6], lsn0=4000, flip=True), epoch=1, mode="mor")
    live = {r["vec_id"]: r for r in idx.table.read_live().collect()}
    assert live[3]["embedding"] == pytest.approx(_vec(3, flip=True))
    assert set(live) == set(range(25))

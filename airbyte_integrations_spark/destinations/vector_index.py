"""Vector-index destination — the Airbyte vector-DB destination family
(destination-pinecone / -weaviate / -qdrant record shape: id + embedding
+ metadata, upsert-by-id, delete-by-id) re-expressed as a lake-native
IVF index the rest of this engine can maintain under CDC semantics.

The write path IS the engine's MERGE apply: records carry the standard
CDC ordering columns, per-key winners are resolved by the associative
max-struct aggregation, tombstones delete vectors, and the epoch-keyed
commit log makes replays exact no-ops. What this module adds is the
index structure around it:

- **Fixed-k coarse codebook**, trained once at index creation from the
  first batch (the k vectors with the smallest (md5(vec_id), vec_id) —
  functions/kmeans.seed_centroids_topk's hash-ordered sample, optionally
  Lloyd-refined) and FROZEN into the table props. k is a constant, so
  cell assignment stays O(n*k) at any corpus size and the codebook is
  always metadata-sized (k*dim doubles of JSON).
- **Write-time cell assignment**: every upserted vector gets its argmax
  floor-cosine cell from the inlined-literal codebook — a pure narrow
  projection (functions/kmeans.assign_cells impl="expr", zero Exchange)
  fused into the MERGE's winner pass.
- **Published serving layout**: `publish()` materializes the live state
  as parquet partitioned BY CELL — the IVF inverted lists. Queries
  probe nprobe cells and the scan prunes to those directories; the
  upsert table (hash-bucketed by vec_id for cheap MERGEs) is never the
  serving path. This is the lake analogue of the vector DB's
  build-segment/serve-segment split.
- **query()**: top-k cosine within probed cells — the serving dataflow
  of q_emb_ann_ivf_topk, against the published snapshot.

Scale shape at 10^10 vectors: upsert cost is O(batch) (MoR deltas or
COW touched-bucket rewrite — table layout knobs are the LakeTable's),
publish is one full scan partitioned k-ways, a query probes
nprobe/k-th of the corpus. Nothing driver-side but the k-row codebook.

Rounding-proof contract: every similarity that reaches a comparison is
floor(cos * 1000) with id tiebreaks, so results are engine-exact
(DuckDB-oracled end to end by the emb_index_lifecycle driver query).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.functions.kmeans import (
    SCALE,
    assign_cells,
    embeddings_base,
    refine_centroids,
    seed_centroids_topk,
)
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable

SERVE_MANIFEST = "serving.json"


def _floor_cos(av, an, bv, bn):
    dot = F.aggregate(
        F.zip_with(av, bv, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    return F.floor(dot / (an * bn) * SCALE).cast("long")


def _cents_df(spark: SparkSession, codebook: list[dict]) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("cent_id", T.LongType()),
            T.StructField("cv", T.ArrayType(T.DoubleType())),
            T.StructField("cn", T.DoubleType()),
        ]
    )
    rows = [(int(c["cent_id"]), [float(x) for x in c["cv"]], float(c["cn"])) for c in codebook]
    return spark.createDataFrame(rows, schema)


class VectorIndex:
    """IVF vector index over a LakeTable; see module docstring."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.table = LakeTable(spark, os.path.join(root, "vectors"))
        self.serve_root = os.path.join(root, "serving")

    # ------------------------------------------------------------- write
    def codebook(self) -> list[dict]:
        cb = self.table.props().get("codebook")
        if not cb:
            raise ValueError("vector index has no trained codebook")
        return cb

    def upsert(
        self,
        batch: DataFrame,
        stream: str = "vectors",
        epoch: int | None = None,
        epoch_meta: dict | None = None,
        k: int = 16,
        lloyd_rounds: int = 0,
        mode: str = "cow",
        n_buckets: int = 32,
    ) -> int:
        """Apply one batch of vector records.

        batch columns: vec_id, embedding (array<float|double>), the CDC
        ordering columns (_ab_cdc_lsn, _ab_cdc_updated_at,
        _ab_cdc_deleted_at, _airbyte_ab_id, _airbyte_emitted_at), plus
        any metadata columns — all carried into the index table.

        First call trains the fixed-k codebook from THIS batch (k and
        lloyd_rounds matter only then) and freezes it in table props;
        every later batch is assigned against the frozen codebook, so
        cell ids are stable across the index's life (re-training is a
        rebuild — create a new index and backfill, the vector DBs'
        reindex story)."""
        if epoch is not None and self.table.exists() and self.table.is_epoch_committed(stream, epoch):
            return self.table.current_version()
        base = embeddings_base(batch.select("vec_id", "embedding"))
        if not self.table.exists():
            cents = seed_centroids_topk(base, k=k)
            for _ in range(lloyd_rounds):
                cents = refine_centroids(assign_cells(base, cents, impl="expr"))
            codebook = [
                {"cent_id": int(r["cent_id"]), "cv": [float(x) for x in r["cv"]], "cn": float(r["cn"])}
                for r in sorted(cents.collect(), key=lambda r: r["cent_id"])
            ]
            if not codebook:
                raise ValueError("cannot train a codebook from an empty first batch")
        else:
            codebook = self.codebook()
        cents = _cents_df(self.spark, codebook)

        def attach_cells(winners: DataFrame) -> DataFrame:
            # Narrow zero-Exchange projection (inlined literal codebook);
            # runs AFTER dedup — only winners pay the k*dim dot products.
            # conform() may have null-backfilled nrm/cell onto the batch
            # (they're in the table schema from creation on): recompute.
            winners = winners.drop("nrm", "cell")
            vecs = assign_cells(
                embeddings_base(winners.select("vec_id", "embedding")), cents,
                impl="expr",
            ).select("vec_id", "nrm", "cell")
            return winners.join(vecs, "vec_id", "left")

        version = merge_into(
            self.table,
            batch,
            stream=stream,
            epoch=epoch,
            epoch_meta=epoch_meta,
            transform_winners=attach_cells,
            mode=mode,
            key=("vec_id",),
            n_buckets=n_buckets,
        )
        if "codebook" not in self.table.props():
            self.table.want_props(codebook=codebook)
            # Make the codebook durable immediately (want_props folds
            # into the NEXT commit; the codebook must survive a crash
            # right after creation or later upserts would retrain and
            # silently shift every cell id).
            version = self.table.commit_marker_epoch(stream, f"codebook:{epoch}")
        return version

    # ----------------------------------------------------------- publish
    def publish(self) -> int:
        """Materialize the live state as the cell-partitioned serving
        snapshot (the IVF inverted lists). Returns the published table
        version. Idempotent per version."""
        version = self.table.current_version()
        out = os.path.join(self.serve_root, f"v{version}")
        live = self.table.read_live()
        (
            live.write.partitionBy("cell")
            .mode("overwrite")
            .parquet(out)
        )
        tmp = os.path.join(self.serve_root, f".{SERVE_MANIFEST}.tmp")
        with open(tmp, "w") as f:
            json.dump({"version": version, "path": out}, f)
        os.replace(tmp, os.path.join(self.serve_root, SERVE_MANIFEST))
        return version

    def serving(self) -> DataFrame:
        with open(os.path.join(self.serve_root, SERVE_MANIFEST)) as f:
            m = json.load(f)
        return self.spark.read.parquet(m["path"])

    # ------------------------------------------------------------- query
    def query(
        self, queries: DataFrame, k: int = 3, nprobe: int = 2
    ) -> DataFrame:
        """Top-k cosine neighbours within each query's nprobe argmax
        cells, against the published serving snapshot.

        queries: (qid, embedding). Returns (qid, vec_id, sim, rank) —
        sim = floor(cos*1000), ties broken by vec_id ASC.

        Plan: probe-cell selection is a narrow projection against the
        literal codebook (no Exchange), candidates come from a
        cell-keyed join against the cell-partitioned serving scan, and
        the per-query top-k is a window over candidates only."""
        codebook = self.codebook()
        qb = embeddings_base(queries.select(F.col("qid").alias("vec_id"), "embedding"))
        arr = F.array(
            *[
                F.struct(
                    _floor_cos(
                        F.col("v"),
                        F.col("nrm"),
                        F.array(*[F.lit(float(x)) for x in c["cv"]]),
                        F.lit(float(c["cn"])),
                    ).alias("csim"),
                    F.lit(-int(c["cent_id"])).alias("neg_cent"),
                )
                for c in codebook
            ]
        )
        probes = (
            qb.select(
                F.col("vec_id").alias("qid"),
                F.col("v").alias("qv"),
                F.col("nrm").alias("qn"),
                F.slice(F.reverse(F.array_sort(arr)), 1, nprobe).alias("_top"),
            )
            .select(
                "qid", "qv", "qn",
                F.explode(F.col("_top")).alias("_p"),
            )
            .select(
                "qid", "qv", "qn",
                (-F.col("_p.neg_cent")).cast("long").alias("cell"),
            )
        )
        serve = self.serving().select(
            F.col("vec_id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("cv2"),
            F.col("nrm").alias("cn2"),
            F.col("cell"),
        )
        cands = probes.join(serve, "cell").select(
            "qid",
            "vec_id",
            _floor_cos(F.col("qv"), F.col("qn"), F.col("cv2"), F.col("cn2")).alias("sim"),
        ).distinct()
        w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id", "sim", "rank")
        )

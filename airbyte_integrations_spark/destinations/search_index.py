"""Search-index destination — destination-elasticsearch's upsert-by-PK
text index (destination-meilisearch is the same shape) re-expressed as
a lake-native inverted index the engine maintains under CDC semantics,
structured exactly like the vector-index destination's build/serve
split (destinations/vector_index.py).

Reference parity (file:line cites into /root/reference/airbyte-
integrations/connectors/destination-elasticsearch):

- Records index by their PRIMARY KEY as the document id, so a re-sync
  of the same key replaces the stored document — upsert-by-_id
  (ElasticsearchConnection.java:146-183 ``indexDocuments`` +
  ``extractPrimaryKey``). Here the write path IS the engine's MERGE
  apply: per-key winners by the standard CDC ordering, tombstones
  delete documents, epoch-keyed commits make replays exact no-ops —
  strictly stronger than the reference (whose no-PK fallback is a
  random UUID per record, :168-170).
- The buffered consumer stages into a TEMP index and swaps it over the
  live one only after a clean sync
  (ElasticsearchAirbyteMessageConsumerFactory.java:40-56,104-117
  tempIndices + onClose ``replaceIndex``; :64-72). Here ``publish()``
  writes a fresh versioned serving snapshot and atomically swaps a
  manifest pointer — readers never see a half-built index, and a
  failed publish leaves the previous snapshot serving.
- ``getRecords`` / search is the read side (:188-199). Here
  ``query()`` scores documents against the published postings.

The index structure (the part Elasticsearch does internally, laid out
Spark-first):

- **Upsert table**: a LakeTable of the stored documents, hash-bucketed
  by key for cheap MERGEs — never the serving path.
- **Published postings**: ``publish()`` tokenizes the live documents
  (functions/neardup.words — the engine's one whitespace+lowercase
  rule) and writes ``(term, doc_id, tf)`` partitioned by
  ``bucket = hash(term) % n_term_buckets`` — the inverted lists —
  plus a per-term document-frequency table in the same layout.
- **query()**: given a metadata-sized ``(query_id, term)`` set, the
  postings scan prunes to the query terms' buckets (partition
  pruning), term df joins by broadcast, scores are the integer-exact
  df-normalized weight ``floor(tf * 1e6 / df)`` summed per (query,
  doc) — the same rounding-proof scoring as q_docs_sparse_retrieval —
  and top-k resolves in one window over already-reduced rows.

Scale shape at 10^10 documents: upsert cost is O(batch); publish is
one full tokenize scan + a map-side-combining (doc, term) agg,
partitioned N_BUCKETS-ways; a query reads only its terms' partitions
(|terms| directories of 1/N_BUCKETS of the postings each); nothing
driver-side but the query set and its bucket ids.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.neardup import words
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable

SERVE_MANIFEST = "serving.json"


class SearchIndex:
    """CDC-maintained inverted text index; see module docstring."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key: tuple[str, ...] = ("doc_id",),
        text_col: str = "text",
    ):
        if len(key) != 1:
            # extractPrimaryKey uses the first PK path (:165-183);
            # composite keys would need a composite _id rule — reject
            # loudly rather than silently concatenating
            raise ValueError("search index needs exactly one key column")
        self.spark = spark
        self.root = root
        self.key = key
        self.text_col = text_col
        self.table = LakeTable(spark, os.path.join(root, "docs"))
        self.serve_root = os.path.join(root, "serving")

    # ------------------------------------------------------------- write
    def upsert(
        self,
        batch: DataFrame,
        stream: str = "docs",
        epoch: int | None = None,
        epoch_meta: dict | None = None,
        mode: str = "cow",
        n_buckets: int = 32,
    ) -> int:
        """Apply one batch of document records (upsert/delete by key —
        indexDocuments' index-by-_id bulk op under the engine's CDC
        ordering). batch carries the key, the text column, the
        standard CDC ordering columns, and any stored metadata."""
        if self.text_col not in batch.columns:
            raise ValueError(f"batch has no {self.text_col!r} column")
        return merge_into(
            self.table,
            batch,
            stream=stream,
            epoch=epoch,
            epoch_meta=epoch_meta,
            mode=mode,
            key=self.key,
            n_buckets=n_buckets,
        )

    # ----------------------------------------------------------- publish
    def publish(self, n_term_buckets: int = 64) -> int:
        """Materialize the live documents as the term-bucket-partitioned
        postings + df snapshot, then atomically swap the serving
        pointer (the temp-index ``replaceIndex`` parity: a crash
        mid-publish leaves the previous snapshot serving). Returns the
        published table version; idempotent per version."""
        version = self.table.current_version()
        out = os.path.join(self.serve_root, f"v{version}")
        kc = self.key[0]
        live = self.table.read_live()
        tok = live.select(
            F.col(kc), F.explode(words(self.text_col)).alias("term")
        ).filter(F.length("term") > 0)
        tf = tok.groupBy(kc, "term").agg(F.count("*").alias("tf"))
        bucket = F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).alias("bucket")
        # tf feeds BOTH serving tables (postings, then per-term df);
        # persist so the full tokenize scan + (doc, term) agg — the
        # expensive part of a publish — runs once, not once per write.
        tf.persist()
        try:
            tf.select(kc, "term", "tf", bucket).write.partitionBy("bucket").mode(
                "overwrite"
            ).parquet(os.path.join(out, "postings"))
            (
                tf.groupBy("term")
                .agg(F.count("*").alias("df"))
                .select("term", "df", bucket)
                .write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(os.path.join(out, "terms"))
            )
        finally:
            tf.unpersist()
        tmp = os.path.join(self.serve_root, f".{SERVE_MANIFEST}.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "path": out, "n_term_buckets": n_term_buckets},
                f,
            )
        os.replace(tmp, os.path.join(self.serve_root, SERVE_MANIFEST))
        return version

    def _serving(self) -> dict:
        with open(os.path.join(self.serve_root, SERVE_MANIFEST)) as f:
            return json.load(f)

    # ------------------------------------------------------------- query
    def query(self, queries: DataFrame, k: int = 10) -> DataFrame:
        """Score the published index against a metadata-sized
        ``(query_id, term)`` set; returns (query_id, rank, <key>,
        score_m, n_terms_hit) — top-k per query, score =
        sum(floor(tf*1e6/df)) with key-ASC tiebreak (integer-exact, so
        results are engine-exact and DuckDB-oracle-able).

        Plan: the postings/df scans prune to the query terms' BUCKET
        partitions (computed once, metadata-sized), df and the query
        set join by broadcast, and the top-k window sees only already-
        reduced (query, doc) rows."""
        m = self._serving()
        kc = self.key[0]
        qrows = queries.select("query_id", "term").collect()  # metadata-sized
        terms = sorted({r["term"] for r in qrows})
        if not terms:
            raise ValueError("empty query set")
        buckets = [
            int(r["b"])
            for r in self.spark.createDataFrame([(t,) for t in terms], "term string")
            .select(
                F.pmod(F.xxhash64("term"), F.lit(m["n_term_buckets"])).alias("b")
            )
            .distinct()
            .collect()
        ]
        post = (
            self.spark.read.parquet(os.path.join(m["path"], "postings"))
            .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        )
        dfreq = (
            self.spark.read.parquet(os.path.join(m["path"], "terms"))
            .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
            .select("term", "df")
        )
        qdf = self.spark.createDataFrame(
            [(int(r["query_id"]), r["term"]) for r in qrows],
            "query_id int, term string",
        )
        scored = (
            post.join(F.broadcast(dfreq), "term")
            .withColumn("w", F.expr("(tf * 1000000L) div df"))
            .join(F.broadcast(qdf), "term")
            .groupBy("query_id", kc)
            .agg(F.sum("w").alias("score_m"), F.count("*").alias("n_terms_hit"))
        )
        win = Window.partitionBy("query_id").orderBy(
            F.col("score_m").desc(), F.col(kc).asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(
                F.col("query_id").cast("int"),
                F.col("rank").cast("int"),
                kc,
                F.col("score_m").cast("long"),
                F.col("n_terms_hit").cast("long"),
            )
        )

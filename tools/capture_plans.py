"""Capture physical-plan evidence for docs/PLANS.md.

Regenerates the plan claims the README makes (pushdown, broadcast,
map-side partial aggregation, UDF placement, column pruning) from live
`.explain` output so they stay checkable.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.extract import with_extracted_text
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lineage import compute_lineage
from airbyte_integrations_spark.operators.dedup import winner_agg, winner_join
from airbyte_integrations_spark.session import get_spark

CHECKS = []


def check(name: str, ok: bool, evidence: str):
    CHECKS.append((name, ok, evidence))


def main() -> None:
    spark = get_spark("plans", cores=8, shuffle_partitions=8)
    root = tempfile.mkdtemp()
    cols = [
        "url", "warc_ts", "html", "lang",
        "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
        "_airbyte_ab_id", "_airbyte_emitted_at",
    ]
    gen_change_events(spark, 50_000, n_urls=2000).select(*cols).write.mode(
        "overwrite"
    ).parquet(root + "/log")
    ev = spark.read.parquet(root + "/log")
    batch = ev.filter("(_ab_cdc_lsn > 1000) AND (_ab_cdc_lsn <= 2000)")

    plan = winner_join(batch)._jdf.queryExecution().executedPlan().toString()
    check(
        "lsn epoch predicate pushed to parquet scan",
        "GreaterThan(_ab_cdc_lsn,1000)" in plan and "LessThanOrEqual(_ab_cdc_lsn,2000)" in plan,
        "PushedFilters: [" + plan.split("PushedFilters: [", 1)[1].split("]", 1)[0] + "]",
    )
    check(
        "max-cursor side broadcast (wide payload never shuffles)",
        "BroadcastHashJoin" in plan,
        "BroadcastHashJoin present in winner_join plan",
    )
    check(
        "map-side partial aggregation in max-cursor agg",
        "partial_max(_ab_cdc_lsn" in plan,
        "HashAggregate(... partial_max(_ab_cdc_lsn ...)) before Exchange",
    )

    extracted = with_extracted_text(winner_join(batch))
    plan2 = extracted._jdf.queryExecution().executedPlan().toString()
    pos_udf = plan2.find("ArrowEvalPython")
    pos_join = plan2.find("BroadcastHashJoin")
    check(
        "extraction UDF above the dedup join (winners only)",
        0 <= pos_udf < pos_join,
        f"ArrowEvalPython at char {pos_udf}, BroadcastHashJoin at {pos_join} (parents print first)",
    )

    lin = compute_lineage(batch, "s", 0)._jdf.queryExecution().executedPlan().toString()
    schema_read = lin.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    check(
        "lineage scan column-pruned (no html/text decode)",
        "html" not in schema_read and "text" not in schema_read,
        f"ReadSchema: {schema_read}",
    )

    from airbyte_integrations_spark.lineage import lineage_bulk_frame
    from airbyte_integrations_spark.streaming.microbatch import plan_epochs

    bulk_epochs = plan_epochs(ev, None, 10_000)
    blin = lineage_bulk_frame(ev, "s", bulk_epochs)._jdf.queryExecution().executedPlan().toString()
    bschema = blin.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    check(
        "bulk lineage: ONE scan for all epochs, column-pruned, partial agg",
        "html" not in bschema and "text" not in bschema
        and blin.count("FileScan") + blin.count("Scan parquet") >= 1
        and "partial_min" in blin,
        f"ReadSchema: {bschema}; single scan with HashAggregate(partial_...)",
    )

    agg_plan = winner_agg(batch)._jdf.queryExecution().executedPlan().toString()
    check(
        "winner_agg partial aggregation before exchange (skew-safe fallback)",
        "partial_max(struct(" in agg_plan,
        "SortAggregate(partial_max(struct(...))) below Exchange",
    )

    # --- lakehouse write paths ---
    from airbyte_integrations_spark.lakehouse.merge import merge_into
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    table = LakeTable(spark, root + "/t")
    merge_into(table, ev.filter("_ab_cdc_lsn <= 25000"), stream="s", epoch=0, mode="mor")
    merge_into(table, ev.filter("_ab_cdc_lsn > 25000"), stream="s", epoch=1, mode="mor")

    # Carried side of a COW rewrite: scan of bucket-pure files +
    # broadcast anti join — must contain NO hash-partitioning shuffle
    # (the whole point of the aligned write path).
    keys = F.broadcast(ev.filter("_ab_cdc_lsn > 25000").select("url").distinct())
    carried = table.read().join(keys, ["url"], "left_anti")
    carried_plan = carried._jdf.queryExecution().executedPlan().toString()
    # The wide carried payload must flow scan -> anti join with no
    # shuffle; the only Exchange allowed is the hash aggregation inside
    # the BroadcastExchange build (O(batch keys), not table payload).
    stream_side = carried_plan.split("BroadcastHashJoin", 1)[1].split("\n")[1].strip()
    check(
        "carried COW payload never shuffles (scan feeds the anti join directly)",
        stream_side.startswith(":- FileScan parquet")
        and "BroadcastExchange" in carried_plan,
        f"stream side of the anti join is `{stream_side[:60]}...` (no Exchange)",
    )

    # Merge-on-read resolution: associative max-by-ordering aggregation
    # (map-side combine — no sort) over base ∪ deltas, delete markers
    # filtered above it.
    res_plan = table.read_resolved()._jdf.queryExecution().executedPlan().toString()
    check(
        "MoR read resolves winner rule over base+deltas (partial agg, no sort)",
        "partial_max(struct(" in res_plan and "Union" in res_plan
        and "Filter isnull(" in res_plan and "_ab_cdc_deleted_at)" in res_plan,
        "partial_max(struct(ordering...)) + Union + tombstone filter in read_resolved plan",
    )

    # Stateful live view: the winner fold must reach the state store
    # through exactly ONE hash shuffle on the key (url) — the stateful
    # operator's required distribution — with no extra Exchange.
    from airbyte_integrations_spark.streaming.stateful import latest_wins_stream

    scols = [c if c != "html" else "text" for c in cols]
    gen_change_events(spark, 20_000, n_urls=1000).select(*scols).write.mode(
        "overwrite"
    ).parquet(root + "/slog")
    sstream = spark.readStream.schema(
        spark.read.parquet(root + "/slog").schema
    ).parquet(root + "/slog")
    q = (
        latest_wins_stream(sstream)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", root + "/sck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    splan = q._jsq.explainInternal(False)
    check(
        "stateful live view: JVM state-store aggregation, map-side partial, "
        "one url shuffle, no Python",
        "StateStoreSave" in splan
        and "partial_max(struct(" in splan
        and splan.count("Exchange hashpartitioning(url") == 1
        and "InPandas" not in splan,
        "StateStoreSave + partial_max(struct(ordering...)) below a single "
        "Exchange hashpartitioning(url, ...); no Python operator in the fold",
    )

    # Repetition stats: both hash aggregations must partial-aggregate
    # map-side — the (id, shingle) key collapses pathological repeats
    # on the mappers before any shuffle.
    from airbyte_integrations_spark.functions.neardup import repetition_stats

    docs = ev.select(
        F.col("_ab_cdc_lsn").alias("doc_id"),
        F.substring(F.col("html").cast("string"), 1, 400).alias("text"),
    ).limit(2000)
    rplan = repetition_stats(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    check(
        "repetition stats: map-side partial aggregation in both stages",
        rplan.count("partial_count") >= 1 and "partial_sum" in rplan,
        "HashAggregate(partial_count) on (doc_id, shingle) + "
        "HashAggregate(partial_sum/count/max) on doc_id",
    )

    # TF-IDF top terms: both tf and df aggregations must partial-
    # aggregate map-side, and the plan must contain no extra scan (no
    # corpus-count crossJoin — a constant factor can't change ranking).
    import __spark_entry__ as ent

    tmp_docs = docs.withColumn("n_chars", F.length("text")).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
    )
    tmp_docs.write.mode("overwrite").parquet(root + "/docs_tbl/documents.parquet")
    tplan = (
        ent.q_docs_tfidf_top_terms(spark, root + "/docs_tbl")
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "tfidf: tf/df aggs map-side partial, no dead corpus-count join",
        tplan.count("partial_count") >= 2 and "NestedLoop" not in tplan,
        "partial_count in tf and df HashAggregates; no BroadcastNestedLoopJoin",
    )

    # Span dedup: the chunk explosion must be a Generate (flatMap, no
    # join), and the first-occurrence pass a map-side-combining min agg.
    splan2 = (
        ent.q_docs_span_dedup(spark, root + "/docs_tbl")
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "span dedup: Generate flatMap chunking + partial_min first-occurrence agg",
        "Generate posexplode" in splan2
        and "partial_min(k" in splan2
        and "NestedLoop" not in splan2,
        "Generate posexplode(spans) + HashAggregate(partial_min(k)) "
        "before the span Exchange; no nested-loop join",
    )

    # Stratified sampling: a pure narrow filter — the whole plan must
    # contain NO Exchange (nothing to shuffle at any scale).
    saplan = (
        ent.q_docs_sample_stratified(spark, root + "/docs_tbl")
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "stratified sample: zero Exchanges (scan -> filter -> project only)",
        "Exchange" not in saplan and "Filter" in saplan,
        "no Exchange operator anywhere in the plan; Filter present above the scan",
    )

    # Sequence packing: shard-local prefix sums — exactly one hash
    # exchange on shard, no range partitioning (a global sort would be
    # the 10^10-doc killer).
    pplan = (
        ent.q_docs_pack_windows(spark, root + "/docs_tbl")
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "pack windows: one shard hash Exchange, no global range sort",
        pplan.count("Exchange hashpartitioning") == 1
        and "Exchange rangepartitioning" not in pplan
        and "Window" in pplan,
        "single Exchange hashpartitioning(shard); running-sum Window "
        "sorts only within partitions",
    )

    # k-means: the assignment pass must broadcast the codebook (a
    # BroadcastNestedLoopJoin over k centroids is the intended shape —
    # never a shuffled cartesian), and the Lloyd update must partial-
    # aggregate the (cell, pos) long sums map-side.
    from airbyte_integrations_spark.functions.kmeans import (
        embeddings_base, refine_centroids, seed_centroids, assign_cells,
    )

    emb = spark.range(0, 2000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), i -> cast(pmod(id * i, 97) / 97.0 - 0.5 as float))"
        ).alias("embedding"),
    )
    kbase = embeddings_base(emb)
    a1 = assign_cells(kbase, seed_centroids(kbase, 97))
    aplan = a1._jdf.queryExecution().executedPlan().toString()
    rkplan = refine_centroids(a1)._jdf.queryExecution().executedPlan().toString()
    check(
        "kmeans assignment (expr impl): literal codebook, pure narrow pass — "
        "zero Exchange, zero join",
        "Exchange" not in aplan and "Join" not in aplan,
        "argmax over the inlined codebook array is a projection; "
        "nothing but the corpus scan at any corpus size",
    )
    aplan_j = (
        assign_cells(kbase, seed_centroids(kbase, 97), impl="join")
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "kmeans assignment (join impl, large-k path): broadcast codebook, "
        "no shuffled cartesian",
        "BroadcastNestedLoopJoin" in aplan_j and "CartesianProduct" not in aplan_j,
        "BroadcastNestedLoopJoin over the k-row codebook; corpus side never shuffles",
    )
    check(
        "kmeans Lloyd update: map-side partial sums on (cell, pos)",
        "partial_sum(sv" in rkplan and "partial_count" in rkplan,
        "HashAggregate(partial_sum(sv)) on (cell, pos) + partial_count per cell "
        "before their Exchanges — k*dim rows cross the wire",
    )

    # as-of join: the sort-merge dataflow must never plan a join —
    # union + ONE key-keyed window (an inequality theta-join would
    # show BroadcastNestedLoopJoin and O(p x v) per key).
    from airbyte_integrations_spark.operators.asof import asof_join

    vsn = ev.select("url", F.col("_ab_cdc_lsn").alias("lsn"), "lang")
    prb = ev.select("url", (F.col("_ab_cdc_lsn") - 1).alias("plsn"))
    asof_plan = (
        asof_join(prb, vsn, ["url"], "plsn", "lsn", ["lang"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "asof join: union + ONE window, zero joins",
        "Join" not in asof_plan
        and asof_plan.count("Exchange hashpartitioning") == 1,
        "Window over union(versions, probes) keyed by url — one Exchange, "
        "linear per key; never a nested-loop inequality join",
    )

    # bloom membership probe: a pure narrow pass (ArrowEvalPython over
    # the scan) — the corpus join only ever sees bitmap-positives.
    from airbyte_integrations_spark.functions.bloom import (
        build_bloom, might_contain,
    )

    fps = ev.select(F.md5(F.col("url")).alias("fp"))
    bloom = build_bloom(fps.limit(1000), "fp", m_bits=1 << 14, k=5)
    probe_plan = (
        fps.filter(might_contain(bloom, "fp"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "bloom membership prefilter: narrow Arrow pass, zero Exchange/join",
        "Exchange" not in probe_plan and "Join" not in probe_plan
        and "ArrowEvalPython" in probe_plan,
        "vectorized pandas probe over the scan; the exact verify join "
        "downstream only receives bitmap-positives",
    )

    # PQ assignment and funnel: entry-level plan shapes (inlined-literal
    # codebook => pure narrow; stacked windows reuse one user Exchange).
    import __spark_entry__ as ent

    sf_small = "/root/testdata/sf0.001"
    if os.path.isdir(sf_small):
        pq_plan = (
            ent.q_emb_pq_codes(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "PQ code assignment: literal codebook, pure narrow pass — no "
            "keyed Exchange/join (only the scale-adaptive round-robin scan "
            "spread, absent at production scan widths)",
            "Exchange hashpartitioning" not in pq_plan
            and "Exchange rangepartitioning" not in pq_plan
            and "Join" not in pq_plan,
            "16 integer subvector distances + argmin as a projection; "
            "nothing but the corpus scan at any corpus size",
        )
        fu_plan = (
            ent.q_events_funnel(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "funnel: three stacked windows + collapse on ONE user-keyed Exchange, zero joins",
            fu_plan.count("Exchange hashpartitioning") == 1
            and "Join" not in fu_plan,
            "Catalyst reuses the user partitioning across all three step "
            "windows and the final aggregation",
        )

        ck_plan = (
            ent.q_cdc_table_checksum(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "reconciliation checksum: bit_xor fold combines map-side, no Sort",
            # the checksum fold prints above the upstream winner Window;
            # no Sort may appear in that (operator-owned) region
            "partial_bit_xor" in ck_plan
            and "Sort" not in ck_plan.split("Window", 1)[0],
            "HashAggregate(partial_bit_xor/partial_count) below the bucket "
            "Exchange; output is n_buckets rows",
        )
        q3_plan = (
            ent.q_tpch_shipping_priority(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "Q3 top-k: TakeOrderedAndProject + broadcast dim join, no global Sort",
            "TakeOrderedAndProject" in q3_plan and "BroadcastHashJoin" in q3_plan,
            "per-partition heap + driver merge of 10 rows; customer dim "
            "broadcast so no orders-sized shuffle for the segment filter",
        )
        hop_plan = (
            ent.q_events_hopping_rates(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "hopping windows: constant-factor expand + ONE map-side-combining agg, no join",
            "Join" not in hop_plan and "partial_count" in hop_plan
            and hop_plan.count("Exchange hashpartitioning") == 1,
            "F.window(slide) expands 4 slots per event then folds one hash agg",
        )

        bl_plan = (
            ent.q_docs_blocklist_filter(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "blocklist gate: broadcast anti-join, corpus never shuffles",
            "BroadcastHashJoin" in bl_plan and "LeftAnti" in bl_plan
            and "Exchange hashpartitioning" not in bl_plan,
            "metadata-sized denylist broadcast; the corpus-side scan "
            "stays a narrow projection at any size",
        )

        dec_plan = (
            ent.q_docs_length_deciles(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "length deciles: NO single-partition global window (range-sharded exact ntile)",
            "Exchange SinglePartition" not in dec_plan
            and "ntile" not in dec_plan,
            "repartitionByRange + per-shard local rank + literal shard-offset "
            "map; the corpus-wide total order never funnels into one reducer",
        )

        hs_plan = (
            ent.q_cdc_host_stats(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "host stats: NO single-partition rank window (range-sharded rank)",
            "Exchange SinglePartition" not in hs_plan,
            "per-host agg ranked via repartitionByRange + per-shard "
            "row_number + literal offset map; ~10^8 hosts never funnel "
            "into one reducer",
        )

        from pyspark.sql import types as T

        from airbyte_integrations_spark.sources.http import (
            HttpStreamConfig,
            read_http_stream,
        )

        http_plan = (
            read_http_stream(
                spark,
                HttpStreamConfig(url_base="http://example.invalid"),
                [{"since": 0}, {"since": 50}],
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("ver", T.LongType()),
                    ]
                ),
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        m_idx = http_plan.find("MapInPandas")
        check(
            "http/declarative read: records parse JVM-side "
            "(from_json above MapInPandas; fetch tasks never reshuffle)",
            m_idx > 0
            and "from_json" in http_plan[:m_idx]
            and "Exchange" not in http_plan[:m_idx],
            "plan top-down: Project(from_json) <- MapInPandas(fetch) <- "
            "slice-fanout Exchange; the only Python is the HTTP I/O and "
            "records go straight from Arrow batches into codegen parsing",
        )

        from airbyte_integrations_spark.sources.declarative import (
            DeclarativeSource,
        )

        dsrc = DeclarativeSource(
            {
                "streams": [
                    {
                        "name": "s",
                        "requester": {
                            "url_base": "http://example.invalid",
                            "path": "items",
                        },
                        "record_selector": "data",
                        "slicer": {"type": "single"},
                        "record_filter": (
                            "{{ record.ver >= config.min_ver and"
                            " record.id not in [1] }}"
                        ),
                        "transformations": [
                            {
                                "type": "AddFields",
                                "fields": [
                                    {
                                        "path": ["shard"],
                                        "value": "{{ stream_slice.shard }}",
                                    }
                                ],
                            }
                        ],
                        "json_schema": {
                            "properties": {
                                "id": {"type": "integer"},
                                "ver": {"type": "integer"},
                            }
                        },
                    }
                ]
            },
            {"min_ver": 5},
        )
        decl_plan = (
            dsrc.streams["s"]
            .read(spark)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        check(
            "declarative record filter + AddFields: compiled to Catalyst "
            "(Filter above the fetch; zero row-at-a-time Python)",
            "Filter" in decl_plan
            and decl_plan.count("MapInPandas") == 1
            and "BatchEvalPython" not in decl_plan
            and "from_json" in decl_plan,
            "the {{ record.ver >= config.min_ver }} condition is a codegen "
            "Filter over from_json-parsed records; stream_slice enrichment "
            "reads a map<string,string> parsed once from the carried slice "
            "JSON — the only Python node is the HTTP fetch task",
        )

    if os.path.isdir("/root/testdata/sf0.001"):
        import __spark_entry__ as entry

        chunk_plan = (
            entry.q_docs_chunk_overlap(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        check(
            "RAG chunk-overlap: narrow Generate expansion — zero Exchange, "
            "zero Python",
            "Generate" in chunk_plan
            and "Exchange" not in chunk_plan
            and "BatchEvalPython" not in chunk_plan
            and "MapInPandas" not in chunk_plan,
            "posexplode(sequence(...)) fan-out stays in the scan stage; "
            "chunking 10^10 docs is shuffle-free",
        )

    if os.path.isdir("/root/testdata/sf0.001"):
        import __spark_entry__ as entry

        c4_plan = (
            entry.q_docs_c4_line_filter(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        check(
            "C4 line cleaning: one codegen'd projection — no keyed "
            "Exchange (only the adaptive scan spread), zero Python, zero "
            "Generate (the line array never explodes)",
            "Exchange hashpartitioning" not in c4_plan
            and "Exchange rangepartitioning" not in c4_plan
            and "BatchEvalPython" not in c4_plan
            and "MapInPandas" not in c4_plan
            and "Generate" not in c4_plan,
            "split/filter/aggregate are Catalyst higher-order functions "
            "inside the scan stage; cleaning 10^10 docs is a pure map",
        )

        sr_plan = (
            entry.q_docs_sparse_retrieval(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        check(
            "sparse retrieval: query-vocab filter before any agg, df and "
            "query map joined by broadcast (corpus never shuffles wide)",
            sr_plan.count("BroadcastHashJoin") >= 2
            and "partial_count" in sr_plan
            and "SortMergeJoin" not in sr_plan,
            "tokens filtered to <=9 literal terms in the scan stage; tf is "
            "a map-side-combined hash agg; both join sides broadcast",
        )

    from airbyte_integrations_spark.sources.partitioned_log import (
        PART_COL,
        _past_offsets,
    )

    plog_ev = ev.withColumn(
        PART_COL, F.pmod(F.xxhash64("url"), F.lit(4)).cast("int")
    )
    plog_plan = (
        _past_offsets(plog_ev, {0: 10, 1: 20, 2: 30, 3: 40}, "_ab_cdc_lsn")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "partitioned-log offsets vector: inlined-literal-map Filter — "
        "no Join, no Exchange",
        "Filter" in plog_plan
        and "Join" not in plog_plan
        and "Exchange" not in plog_plan,
        "offset > offsets[part] rides the scan as a narrow predicate; "
        "the {partition: offset} vector is metadata-sized and never "
        "becomes a join side",
    )

    from airbyte_integrations_spark.functions.pq import (
        adc_luts,
        adc_topk,
        int_vectors,
        pq_code_columns,
        seed_codebook,
    )

    pq_vecs = int_vectors(
        spark.range(500).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: F.sin(F.col("id") * 7 + d * 13).cast("float"),
            ).alias("embedding"),
        )
    )
    pq_cents = seed_codebook(pq_vecs, k=4)
    pq_codes = pq_code_columns(pq_vecs, pq_cents, with_err=False)
    pq_q = pq_vecs.filter(F.col("vec_id") < 4).select("vec_id", "v")
    pq_plan = (
        adc_topk(pq_codes, adc_luts(pq_q, pq_cents), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "PQ ADC search: codes are a join-free projection; the LUT join is "
        "BroadcastNestedLoop (corpus never shuffles for it); the rank<=k "
        "window has a map-side Partial WindowGroupLimit (no per-query "
        "single-reducer partition)",
        "BroadcastNestedLoopJoin" in pq_plan
        and "SortMergeJoin" not in pq_plan
        and "row_number(), 5, Partial" in pq_plan,
        "one BNLJ against the |Q|-row LUT table; each scan task forwards "
        "at most k rows per qid before the per-qid Exchange",
    )

    if os.path.isdir(sf_small):
        qc_plan = (
            ent.q_docs_quality_classifier(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "hashed linear quality classifier: bigrams+bucketing+weighted sum "
            "inside ONE higher-order aggregate fold — no keyed Exchange "
            "(only the adaptive scan spread), zero Generate, zero Python",
            "Exchange hashpartitioning" not in qc_plan
            and "Exchange rangepartitioning" not in qc_plan
            and "Generate" not in qc_plan
            and "EvalPython" not in qc_plan,
            "the whole fastText-style keep/drop verdict is a narrow codegen "
            "projection; classifies at scan speed at any corpus size",
        )
        sr_plan = (
            ent.q_docs_span_removal(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString()
        )
        check(
            "exact-substring excision: first-occurrence agg is map-side "
            "partial; no SortMergeJoin, no global (unpartitioned) Sort",
            "partial_min" in sr_plan and "SortMergeJoin" not in sr_plan
            and "Exchange SinglePartition" not in sr_plan,
            "span-keyed min(k) combines on the mappers; verdict join is "
            "span-hash-keyed; regroup bounded by one doc's span count",
        )

    from airbyte_integrations_spark.catalog_sync import select_fields
    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lineage import lineage_balanced_frame
    from airbyte_integrations_spark.streaming.microbatch import (
        plan_epochs_balanced,
    )

    fs_plan = (
        select_fields(ev, SyncConfig(stream="pages", selected_fields=("html",)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    fs_schema = [ln for ln in fs_plan.splitlines() if "ReadSchema" in ln][0]
    check(
        "catalog field selection prunes the parquet scan (deselected "
        "columns never read, not read-then-dropped)",
        "lang" not in fs_schema and "warc_ts" not in fs_schema
        and "html" in fs_schema and "url" in fs_schema,
        "ReadSchema drops deselected payload columns; pk/cursor/system ride",
    )

    eps_b = plan_epochs_balanced(ev, None, 10_000)
    lb_plan = (
        lineage_balanced_frame(ev, "pages", eps_b, target=10_000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "balanced-plan bulk lineage: global rank via bucket-partitioned "
        "window (no single-partition Sort anywhere), cum/epoch maps "
        "broadcast, final per-(epoch,pid) agg map-side partial",
        "Exchange SinglePartition" not in lb_plan
        and "BroadcastHashJoin" in lb_plan
        and "partial_min" in lb_plan,
        "one bucket-keyed Exchange of (lsn, deleted_at, pid) is the only "
        "event-sized shuffle; all epochs' lineage in one job instead of "
        "one scan per epoch",
    )

    # ---- check 39: debezium envelope parse (one projection, no Python)
    from airbyte_integrations_spark.sources.debezium import (
        emit_debezium,
        parse_debezium,
    )

    dbz_lines = emit_debezium(ev, ["url", "lang"])
    dbz_plan = (
        parse_debezium(dbz_lines, "url string, lang string")
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "debezium envelope decode is one from_json projection "
        "(codegen, zero Python eval nodes)",
        "from_json" in dbz_plan
        and "BatchEvalPython" not in dbz_plan
        and "ArrowEvalPython" not in dbz_plan
        and "MapInPandas" not in dbz_plan,
        "the reference's per-event Jackson loop is a single executor-"
        "side Project here",
    )

    # ---- check 40: KMV per-group top-k is WindowGroupLimit (partial)
    from airbyte_integrations_spark.functions.sketch import kmv_per_group

    kmv_plan = (
        kmv_per_group(ev, "lang", "url", k=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "KMV per-group sketch: rank<=k compiles to WindowGroupLimit "
        "with a map-side Partial pass (each task forwards <= k hashes "
        "per group), distinct collapses map-side first",
        "WindowGroupLimit" in kmv_plan
        and "Partial" in kmv_plan
        and "Exchange SinglePartition" not in kmv_plan,
        "per-group NDV cost is O(k) rows per group per task regardless "
        "of corpus size",
    )

    # ---- check 41: priority sample is TakeOrderedAndProject
    from airbyte_integrations_spark.functions.curation import (
        priority_sample_key,
    )

    ps_plan = (
        ev.select(
            "url",
            priority_sample_key(F.col("url"), F.length("url")).alias("k"),
        )
        .orderBy("k", "url")
        .limit(200)
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "priority sampling: top-m by deterministic key is "
        "TakeOrderedAndProject (map-side top-m per task, no range "
        "Exchange, no global sort, no Python)",
        "TakeOrderedAndProject" in ps_plan
        and "Exchange rangepartitioning" not in ps_plan
        and "BatchEvalPython" not in ps_plan,
        "weight-proportional sampling moves m rows per task, total "
        "m * n_tasks, at any corpus size",
    )

    # ---- check 42: z-order clustered write has no global Exchange
    from airbyte_integrations_spark.lakehouse.zorder import zorder_key

    zsrc = ev.withColumn("value_m", F.pmod(F.xxhash64("url"), F.lit(1000)))
    zk = zorder_key(
        {"_ab_cdc_lsn": (0, 50_000), "value_m": (0, 999)},
        ("_ab_cdc_lsn", "value_m"),
    )
    z_plan = (
        zsrc.repartition(8, F.col("url"))
        .sortWithinPartitions(zk)
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "z-order clustering: Morton key is inline codegen integer "
        "arithmetic; the clustering sort is per-bucket "
        "(sortWithinPartitions — no range/global Exchange, no Python)",
        "Sort [" in z_plan
        and "], false, 0" in z_plan  # sortWithinPartitions prints global=false
        and "], true, 0" not in z_plan  # no global sort anywhere
        and "Exchange rangepartitioning" not in z_plan
        and "BatchEvalPython" not in z_plan
        and "ArrowEvalPython" not in z_plan,
        "multi-dimension file skipping costs one local sort at write "
        "time, zero extra shuffles",
    )

    # ---- check 43: mysql-dialect debezium decode (composite position
    # fold is inline codegen; still zero Python)
    my_lines = emit_debezium(ev, ["url", "lang"], dialect="mysql", binlog_file_size=1000)
    my_plan = (
        parse_debezium(my_lines, "url string, lang string", dialect="mysql")
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "mysql binlog decode: (file, pos) -> engine position is inline "
        "codegen (regexp_extract + integer arithmetic) inside the same "
        "one-projection from_json parse, zero Python eval nodes",
        "from_json" in my_plan
        and "regexp_extract" in my_plan
        and "BatchEvalPython" not in my_plan
        and "ArrowEvalPython" not in my_plan
        and "Exchange" not in my_plan,
        "composite-position folding adds no shuffle and no UDF: the "
        "MySqlCdcTargetPosition compare is a projection expression",
    )

    # ---- check 44: schemaless (mongo) collection read is one typed
    # variant-extraction projection, no Python, no shuffle
    import json as _json

    from airbyte_integrations_spark.sources.mongo import (
        discover_collection,
        read_collection,
    )

    mdocs = spark.createDataFrame(
        [
            (_json.dumps({"_id": "a", "n": 1, "meta": {"k": 1}, "seq": 1}),),
            (_json.dumps({"_id": "b", "n": "x", "meta": {"k": 2}, "seq": 2}),),
        ],
        "value string",
    )
    mfields = discover_collection(spark, mdocs)
    m_plan = (
        read_collection(spark, mdocs, mfields, cursor_gt=("seq", 0))
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "schemaless collection read: discovery-typed extraction is ONE "
        "codegen projection over parse_json (try_variant_get per "
        "column, mixed fields stringified in the same pass), cursor "
        "filter fused, zero Python, zero Exchange",
        "variant_get" in m_plan.lower()
        and "BatchEvalPython" not in m_plan
        and "ArrowEvalPython" not in m_plan
        and "MapInPandas" not in m_plan
        and "Exchange" not in m_plan,
        "reading 10^10 schemaless documents is a narrow scan+project; "
        "the mixed-type rule costs zero extra passes",
    )

    # ---- check 45: update-description decode (the default Mongo
    # update wire) is still one projection — masks derived inline
    from airbyte_integrations_spark.sources.mongo import (
        emit_change_stream,
        fields_from_schema,
        parse_change_stream,
    )

    ud_lines = emit_change_stream(
        ev.withColumn("op", F.lit("update")).withColumn(
            "removed", F.array(F.lit("lang"))
        ),
        ["url", "lang"],
        op_col="op",
        removed_col="removed",
    )
    ud_parsed = parse_change_stream(
        ud_lines,
        fields_from_schema("url string, lang string"),
        update_description=True,
    )
    ud_plan = ud_parsed._jdf.queryExecution().executedPlan().toString()
    check(
        "update-description decode: $set/$unset write masks are inline "
        "codegen (json_object_keys + array_contains) in the same "
        "one-projection from_json parse, zero Python, zero Exchange",
        "from_json" in ud_plan
        and "get_json" in ud_plan
        and "array_contains" in ud_plan
        and "BatchEvalPython" not in ud_plan
        and "ArrowEvalPython" not in ud_plan
        and "Exchange" not in ud_plan,
        "partial-image events decode as a narrow projection; the "
        "untouched-vs-unset distinction costs no extra pass",
    )

    # ---- check 46: mask-aware patch fold is ONE hash agg with
    # map-side partial combine (hot keys cost O(n_mappers))
    from airbyte_integrations_spark.operators.patch import coalesce_patches

    pf = ev.withColumn("wa", F.col("_ab_cdc_lsn") % 3 != 0).withColumn(
        "a", F.when(F.col("wa"), F.col("lang"))
    )
    p_plan = (
        coalesce_patches(pf, patch_cols=("a",), mask_cols=("wa",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "patch fold: per-column latest-write overlay is ONE hash "
        "aggregation with partial_max below the key Exchange, zero "
        "Python, no per-key sort",
        "partial_max" in p_plan
        and p_plan.count("Exchange") == 1
        and "BatchEvalPython" not in p_plan
        and "ArrowEvalPython" not in p_plan
        and "Window" not in p_plan,
        "10^10 partial-image events fold at map-side-combine cost; "
        "the window variant exists only as the equivalence oracle",
    )

    # ---- check 48: bucket-keyed MoR dedup — the winner aggregation's
    # ONE exchange is the delta writer's own bucket layout (guide §2.4:
    # operations keyed the same way share one exchange), so the delta
    # write runs aligned with no second shuffle and no extra sort.
    from airbyte_integrations_spark.lakehouse.table import bucket_expr
    from airbyte_integrations_spark.operators.dedup import winner_agg_bucketed

    wb_plan = (
        winner_agg_bucketed(
            batch, ("url",), "_ab_cdc_lsn",
            ("_ab_cdc_updated_at", "_airbyte_emitted_at"), "_airbyte_ab_id",
            bucket_expr(("url",), 32), 32,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "MoR epoch dedup keyed on the write bucket: ONE exchange "
        "(hashpartitioning(_bucket)) shared by aggregation and file "
        "layout; no url-hash exchange anywhere",
        wb_plan.count("Exchange hashpartitioning") == 1
        and "Exchange hashpartitioning(_bucket" in wb_plan
        and "hashpartitioning(url" not in wb_plan
        and "max(struct(" in wb_plan,
        "Exchange hashpartitioning(_bucket, 32) -> Sort(_bucket, url) "
        "-> SortAggregate(max(struct(ordering..., payload))) -> "
        "aligned per-bucket write (append_deltas aligned=True)",
    )

    out = ["# PLANS — physical-plan evidence (generated by tools/capture_plans.py)", ""]
    ok_all = True
    for name, ok, ev in CHECKS:
        ok_all &= ok
        out.append(f"- [{'x' if ok else ' '}] **{name}**  ")
        out.append(f"  `{ev}`")
    out.append("")
    out.append(f"All checks passing: **{ok_all}**")
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("\n".join(out))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()

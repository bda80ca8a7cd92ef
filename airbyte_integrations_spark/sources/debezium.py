"""Debezium change-event envelope codec.

The reference embeds Debezium and converts each raw engine event into
an Airbyte record driver-side, one Jackson tree at a time
(bases/debezium/.../DebeziumEventUtils.java:22-65): ``base`` is the
``after`` image unless it is null (delete), in which case the
``before`` image is used and ``_ab_cdc_deleted_at`` is stamped with the
transaction timestamp; ``_ab_cdc_updated_at`` is ``source.ts_ms`` for
every event; the per-database metadata injector adds the log position
(``source.lsn`` -> ``_ab_cdc_lsn``,
source-postgres/.../PostgresCdcConnectorMetadataInjector.java:17-18).

Spark-first: the whole conversion is ONE ``from_json`` projection over
the envelope lines — executor-side, codegen, zero per-record Python —
instead of the reference's per-event Jackson mutation on a single
thread. The inverse (``emit_debezium``) renders a change-event frame
back into envelope JSONL with ``to_json``, giving a byte-stable
round-trip for tests and a fixture generator for the catalog arm.

Timestamps: Debezium's classic ``source.ts_ms`` is millisecond-
precision; events whose commit stamps carry sub-millisecond digits
would not round-trip. Debezium 2.5+ added ``source.ts_us``; both are
carried here, and the parser prefers ``ts_us`` when present (falling
back to ``ts_ms * 1000``), so micro-precision logs round-trip exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# source-block fields the codec reads/writes. Real Debezium source
# blocks carry many more (connector, version, snapshot, txId, ...);
# from_json ignores extras by design, so any real envelope parses.
_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
    ]
)

# MySQL's Debezium source block has no lsn: the log position is the
# composite (binlog file name, byte offset) pair — SHOW MASTER STATUS
# File/Position, compared file-name-first then position
# (source-mysql/.../MySqlCdcTargetPosition.java:71-80).
_MYSQL_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("row", T.LongType(), True),
        T.StructField("server_id", T.LongType(), True),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
    ]
)

# SQL Server's Debezium source block: positions are 10-byte log
# sequence numbers rendered as colon-separated fixed-width hex
# "vlfSeqNo:blockOffset:slotNo" (io.debezium Lsn.toString). change_lsn
# identifies THIS change; commit_lsn is the enclosing transaction's
# commit record (>= every change_lsn in the tx); event_serial_no
# disambiguates multi-event operations (an update emits delete+insert
# pairs sharing a change_lsn in some capture modes).
_MSSQL_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("commit_lsn", T.StringType(), True),
        T.StructField("change_lsn", T.StringType(), True),
        T.StructField("event_serial_no", T.LongType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
    ]
)

_DIALECT_SOURCE = {
    "postgres": _SOURCE_SCHEMA,
    "mysql": _MYSQL_SOURCE_SCHEMA,
    "mssql": _MSSQL_SOURCE_SCHEMA,
}

# Bits reserved for the within-file byte offset when folding MySQL's
# (file, pos) pair into the engine's single monotone position. MySQL
# caps binlog files at max_binlog_size <= 1 GiB (2^30; one oversized
# transaction can overrun a file, but not by 2^10x), so 40 bits of
# offset is generous and leaves 23 bits of file ordinal headroom.
_BINLOG_POS_BITS = 40


def mysql_binlog_lsn(file: Column | str, pos: Column | str) -> Column:
    """Fold MySQL's composite binlog position into one monotone long:
    ``file_ordinal * 2^40 + pos``.

    The reference compares CDC positions file-name-first, then byte
    offset (MySqlCdcTargetPosition.java:71-80 ``fileName.compareTo``
    then ``position >=``); Debezium names binlog files with a
    zero-padded numeric suffix (``mysql-bin.000003``), so the numeric
    suffix IS the file ordinal. Extracting it digit-wise is strictly
    more robust than the reference's lexicographic compare, which
    inverts once the suffix outgrows its padding (``mysql-bin.1000000``
    sorts before ``mysql-bin.999999`` as a string, after it as a log).
    Pure codegen (regexp + integer arithmetic), order-isomorphic to
    the composite pair whenever pos < 2^40.
    """
    f = F.col(file) if isinstance(file, str) else file
    p = F.col(pos) if isinstance(pos, str) else pos
    seq = F.regexp_extract(f, r"(\d+)$", 1).cast("long")
    return (seq * F.lit(1 << _BINLOG_POS_BITS) + p).cast("long")


# Bit budget for folding SQL Server's 80-bit (vlf, block, slot) LSN
# into the engine's 63-bit monotone position: 27 bits of VLF sequence
# (2^27 VLFs ~= exabytes of log through one instance at 64 MiB VLFs),
# 26 bits of block offset (a 32 GiB VLF at 512-byte log blocks), 10
# bits of slot (a 60 KiB log block floors record size at ~60 bytes).
# Positions outside the budget FAIL LOUDLY (raise_error in the decode
# projection) instead of silently mis-ordering — the same strict-
# rejection contract as the Avro union decoder.
_MSSQL_VLF_BITS = 27
_MSSQL_BLOCK_BITS = 26
_MSSQL_SLOT_BITS = 10


def mssql_lsn(change_lsn: Column | str) -> Column:
    """Fold SQL Server's hex LSN string into one monotone long:
    ``vlf * 2^36 + block * 2^10 + slot``.

    The reference's target position wraps io.debezium Lsn and compares
    its 10-byte binary (MssqlCdcTargetPosition.java:32-41 via
    Lsn.compareTo) — equivalent to comparing the zero-padded hex parts
    numerically, which is exactly what the fold preserves whenever the
    parts fit the documented bit budget; any overflow raises in-query.
    Pure codegen (split + conv + integer arithmetic)."""
    c = F.col(change_lsn) if isinstance(change_lsn, str) else change_lsn
    parts = F.split(c, ":")
    vlf = F.conv(parts[0], 16, 10).cast("long")
    block = F.conv(parts[1], 16, 10).cast("long")
    slot = F.conv(parts[2], 16, 10).cast("long")
    bad = (
        (vlf >= F.lit(1 << _MSSQL_VLF_BITS))
        | (block >= F.lit(1 << _MSSQL_BLOCK_BITS))
        | (slot >= F.lit(1 << _MSSQL_SLOT_BITS))
    )
    folded = (
        vlf * F.lit(1 << (_MSSQL_BLOCK_BITS + _MSSQL_SLOT_BITS))
        + block * F.lit(1 << _MSSQL_SLOT_BITS)
        + slot
    ).cast("long")
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(
                    "mssql lsn outside the 27/26/10-bit fold budget: "
                ),
                c,
            )
        ).cast("long"),
    ).otherwise(folded)


def mssql_lsn_hex(lsn: Column | str) -> Column:
    """Inverse rendering: engine position -> the colon-separated
    fixed-width hex Lsn string (8/8/4 digits, Lsn.toString shape)."""
    v = (F.col(lsn) if isinstance(lsn, str) else lsn).cast("long")
    # bit shifts, not `/`: float division loses exactness past 2^53
    vlf = F.shiftright(v, _MSSQL_BLOCK_BITS + _MSSQL_SLOT_BITS)
    block = F.shiftright(v, _MSSQL_SLOT_BITS) % F.lit(1 << _MSSQL_BLOCK_BITS)
    slot = v % F.lit(1 << _MSSQL_SLOT_BITS)
    # lowercase to match io.debezium Lsn.toString byte-for-byte (the
    # codec round-trips either case, but emitted fixtures should be
    # wire-identical to real logs)
    return F.lower(
        F.concat_ws(
            ":",
            F.lpad(F.hex(vlf), 8, "0"),
            F.lpad(F.hex(block), 8, "0"),
            F.lpad(F.hex(slot), 4, "0"),
        )
    )


def envelope_schema(
    value_schema: T.StructType | str, dialect: str = "postgres"
) -> T.StructType:
    """Spark schema of one Debezium envelope for a given row shape
    (the embedded engine's JSON value with schemas disabled:
    ``{before, after, source, op, ts_ms}``). ``dialect`` picks the
    source-block shape: postgres carries ``lsn``, mysql carries the
    composite ``(file, pos)``."""
    if isinstance(value_schema, str):
        value_schema = T.StructType.fromDDL(value_schema)
    if dialect not in _DIALECT_SOURCE:
        raise ValueError(f"unknown debezium dialect: {dialect!r}")
    return T.StructType(
        [
            T.StructField("before", value_schema, True),
            T.StructField("after", value_schema, True),
            T.StructField("source", _DIALECT_SOURCE[dialect], True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


_CORRUPT_COL = "_corrupt_record"


def _parsed_with_policy(
    lines: DataFrame, raw: Column, env: T.StructType, malformed: str
) -> tuple[DataFrame, Column]:
    """Apply the malformed-line policy around one from_json parse;
    returns (possibly filtered lines, parse expression)."""
    if malformed == "error":
        return lines, F.from_json(raw, env, {"mode": "FAILFAST"})
    if malformed == "skip":
        env2 = T.StructType(
            list(env.fields) + [T.StructField(_CORRUPT_COL, T.StringType(), True)]
        )
        p = F.from_json(
            raw,
            env2,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL},
        )
        return lines.filter(p[_CORRUPT_COL].isNull()), p
    if malformed == "permissive":
        return lines, F.from_json(raw, env)
    raise ValueError(f"unknown malformed policy {malformed!r}")


def parse_debezium(
    lines: DataFrame,
    value_schema: T.StructType | str,
    json_col: str = "value",
    emitted_at: Column | None = None,
    include_table: bool = False,
    dialect: str = "postgres",
    malformed: str = "error",
) -> DataFrame:
    """Envelope JSONL -> change-event frame.

    Output columns: every field of ``value_schema`` (taken from the
    ``after`` image, or ``before`` for deletes — DebeziumEventUtils
    .java:50 ``after.isNull() ? before : after``), plus
      - ``_ab_cdc_lsn``        = source.lsn  (metadata injector parity)
      - ``_ab_cdc_updated_at`` = source.ts_us else ts_ms*1000 (:52-55)
      - ``_ab_cdc_deleted_at`` = updated_at when after is null (:58-62)
      - ``_op``                = the envelope op (c/u/d/r)
      - ``_airbyte_ab_id``     = md5(raw line)  (deterministic id; the
        reference assigns ids downstream, not from the envelope)
      - ``_airbyte_emitted_at``= ``emitted_at`` if given, else the
        transaction timestamp (deterministic replacement for the
        reference's wall-clock ``emittedAt``, same policy as the
        Singer/wire adapters).

    ``include_table=True`` adds ``_table`` = ``source.table`` — the
    stream-routing column of a multi-table connector log (the
    reference routes on it at DebeziumEventUtils.java:32
    ``source.get("table")``); see ``shared_log_from_envelopes``.

    ``dialect="mysql"``: the source block carries the composite
    binlog position instead of an lsn. ``_ab_cdc_lsn`` is synthesized
    via :func:`mysql_binlog_lsn` (order-isomorphic to the reference's
    file-then-pos compare, MySqlCdcTargetPosition.java:71-80), and the
    raw pair rides as ``_ab_cdc_log_file`` / ``_ab_cdc_log_pos`` —
    byte-for-byte the reference's MySQL metadata-injector columns
    (MySqlCdcConnectorMetadataInjector.java:17-20, declared at
    MySqlSource.java:54-55,93-94).

    ``dialect="mssql"``: positions are SQL Server's 10-byte LSNs as
    colon-separated hex strings. ``_ab_cdc_lsn`` is synthesized from
    ``source.change_lsn`` via :func:`mssql_lsn` (order-isomorphic to
    the reference's Lsn.compareTo, MssqlCdcTargetPosition.java:32-47,
    within the documented bit budget — overflow raises); the commit
    hex rides as ``_ab_cdc_commit_lsn`` — the exact value the
    reference injects as its string ``_ab_cdc_lsn``
    (MssqlCdcConnectorMetadataInjector.java:17-18, declared string at
    MssqlSource.java:59,405) — plus ``_ab_cdc_event_serial_no``. Use
    the commit hex as ``tx_col`` for transaction-aligned epochs.

    ``malformed`` decides what a non-JSON line does: "error" (default)
    fails the job with Spark's FAILFAST diagnostics — a corrupt WAL
    tail should stop the sync, not silently emit a null-keyed row;
    "skip" drops exactly the corrupt lines (corrupt-record column
    filter, still one projection); "permissive" keeps Spark's default
    all-null rows (forensics only).
    """
    if isinstance(value_schema, str):
        value_schema = T.StructType.fromDDL(value_schema)
    env = envelope_schema(value_schema, dialect=dialect)
    raw = F.col(json_col)
    lines, p = _parsed_with_policy(lines, raw, env, malformed)
    base = F.when(p["after"].isNotNull(), p["after"]).otherwise(p["before"])
    updated = F.timestamp_micros(
        F.coalesce(p["source"]["ts_us"], p["source"]["ts_ms"] * F.lit(1000))
    )
    deleted = F.when(p["after"].isNull(), updated)
    emitted = emitted_at if emitted_at is not None else updated
    cols = [base[f.name].alias(f.name) for f in value_schema.fields]
    if dialect == "mysql":
        lsn = mysql_binlog_lsn(p["source"]["file"], p["source"]["pos"])
        injector = [
            p["source"]["file"].alias("_ab_cdc_log_file"),
            p["source"]["pos"].alias("_ab_cdc_log_pos"),
        ]
    elif dialect == "mssql":
        # engine position from change_lsn (unique per change; orders
        # same-transaction events, which share commit_lsn). The commit
        # hex rides as _ab_cdc_commit_lsn — the exact value the
        # reference injects as its string _ab_cdc_lsn
        # (MssqlCdcConnectorMetadataInjector.java:17-18) — and doubles
        # as the tx_col for transaction-aligned epoch planning.
        # Snapshot ('r') events carry change_lsn=null with only
        # commit_lsn set (io.debezium SqlServer snapshot source block);
        # commit_lsn >= every member change_lsn, so coalescing keeps
        # the ordering contract instead of silently dropping snapshot
        # rows to a null position.
        lsn = mssql_lsn(
            F.coalesce(p["source"]["change_lsn"], p["source"]["commit_lsn"])
        )
        injector = [
            p["source"]["commit_lsn"].alias("_ab_cdc_commit_lsn"),
            p["source"]["event_serial_no"].alias("_ab_cdc_event_serial_no"),
        ]
    else:
        lsn = p["source"]["lsn"]
        injector = []
    extra = [p["source"]["table"].alias("_table")] if include_table else []
    return lines.select(
        *cols,
        lsn.alias("_ab_cdc_lsn"),
        updated.alias("_ab_cdc_updated_at"),
        deleted.alias("_ab_cdc_deleted_at"),
        p["op"].alias("_op"),
        F.md5(raw).alias("_airbyte_ab_id"),
        emitted.alias("_airbyte_emitted_at"),
        *injector,
        *extra,
    )


def emit_debezium(
    events: DataFrame,
    value_cols: list[str],
    lsn_col: str = "_ab_cdc_lsn",
    updated_col: str = "_ab_cdc_updated_at",
    deleted_col: str = "_ab_cdc_deleted_at",
    table: str = "pages",
    snapshot_lsn: int | None = None,
    table_col: str | None = None,
    dialect: str = "postgres",
    binlog_file_size: int = 1 << _BINLOG_POS_BITS,
    commit_lsn_col: str | None = None,
) -> DataFrame:
    """Change-event frame -> envelope JSONL (one ``value`` column).

    The inverse rendering: deletes (``deleted_col`` not null) carry the
    row as the ``before`` image with ``after`` explicitly null; live
    events carry it as ``after``. ``op`` is ``d`` for deletes, ``r``
    for rows at ``snapshot_lsn`` (Debezium's snapshot-read op), else
    ``u`` (an upsert — the engine's MERGE semantics do not distinguish
    ``c`` from ``u``, exactly like the reference's formatDebeziumData
    which never reads ``op``). Rendered distributed with ``to_json``;
    explicit nulls kept so the parse side sees the same shape Debezium
    writes.

    ``dialect="mysql"`` renders the composite binlog position instead
    of an lsn: ``file = mysql-bin.%06d(lsn div binlog_file_size)``,
    ``pos = lsn mod binlog_file_size``. With the default file size of
    2^40 the re-parsed ``_ab_cdc_lsn`` equals the input exactly; any
    smaller ``binlog_file_size`` forces file rollovers while keeping
    the re-parsed position order-isomorphic to the input — the fixture
    knob for exercising MySqlCdcTargetPosition's file-then-pos rule.
    """
    img = F.struct(*[F.col(c) for c in value_cols])
    is_del = F.col(deleted_col).isNotNull()
    us = F.unix_micros(F.col(updated_col).cast("timestamp"))
    op = F.when(is_del, F.lit("d"))
    if snapshot_lsn is not None:
        op = op.when(F.col(lsn_col) == F.lit(snapshot_lsn), F.lit("r"))
    op = op.otherwise(F.lit("u"))
    tbl = F.col(table_col) if table_col is not None else F.lit(table)
    lsn = F.col(lsn_col).cast("long")
    if dialect == "mysql":
        if not 0 < binlog_file_size <= (1 << _BINLOG_POS_BITS):
            raise ValueError("binlog_file_size must be in (0, 2^40]")
        size = F.lit(int(binlog_file_size))
        # SQL `div` for exact 64-bit integer division (float `/` would
        # round positions past 2^53).
        seq = F.expr(
            f"CAST({lsn_col} AS BIGINT) div CAST({int(binlog_file_size)} AS BIGINT)"
        )
        src = F.struct(
            F.floor(us / 1000).cast("long").alias("ts_ms"),
            us.alias("ts_us"),
            F.format_string("mysql-bin.%06d", seq).alias("file"),
            (lsn % size).alias("pos"),
            F.lit(1).cast("long").alias("server_id"),
            tbl.alias("table"),
        )
    elif dialect == "mssql":
        # change_lsn from the engine position via the exact hex
        # inverse; commit_lsn from ``commit_lsn_col`` when given (a
        # long column holding the transaction's commit position — by
        # construction >= every member change_lsn, like the server's
        # commit record), else the row's own position (autocommit).
        commit = (
            F.col(commit_lsn_col).cast("long")
            if commit_lsn_col is not None
            else lsn
        )
        src = F.struct(
            F.floor(us / 1000).cast("long").alias("ts_ms"),
            us.alias("ts_us"),
            mssql_lsn_hex(commit).alias("commit_lsn"),
            mssql_lsn_hex(lsn).alias("change_lsn"),
            F.lit(1).cast("long").alias("event_serial_no"),
            tbl.alias("table"),
        )
    elif dialect == "postgres":
        src = F.struct(
            F.floor(us / 1000).cast("long").alias("ts_ms"),
            us.alias("ts_us"),
            lsn.alias("lsn"),
            tbl.alias("table"),
        )
    else:
        raise ValueError(f"unknown debezium dialect: {dialect!r}")
    envelope = F.struct(
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        src.alias("source"),
        op.alias("op"),
        F.floor(us / 1000).cast("long").alias("ts_ms"),
    )
    return events.select(
        F.to_json(envelope, {"ignoreNullFields": "false"}).alias("value")
    )


def shared_log_from_envelopes(
    spark,
    path: str,
    value_schema: T.StructType | str,
    stream_col: str = "stream",
    dialect: str = "postgres",
) -> DataFrame:
    """Multi-table envelope JSONL -> the interleaved shared-WAL frame
    `sync_shared_log` consumes: one total lsn order across tables,
    routed by `stream_col` = the envelope's ``source.table`` (exactly
    how the reference names each record's stream,
    DebeziumEventUtils.java:32). This is the REAL Debezium connector
    shape — one engine, one offset, many tables in one log — feeding
    the GLOBAL-state lock-step loop; still one from_json projection."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    return (
        parse_debezium(lines, value_schema, include_table=True, dialect=dialect)
        .drop("_op")
        .withColumnRenamed("_table", stream_col)
    )


def events_from_decoded_envelopes(
    df: DataFrame,
    dialect: str = "postgres",
    include_table: bool = False,
) -> DataFrame:
    """Envelope STRUCT columns -> change-event frame.

    The JSONL path (`parse_debezium`) owns the from_json decode; this
    is the same projection for envelopes that arrive ALREADY decoded as
    struct columns (``before``/``after``/``source``/``op``) — e.g. a
    registry-framed Avro topic (sources/avro_wire.py) whose body is the
    Debezium envelope record, the production Kafka shape. Same rules:
    after-else-before base image (DebeziumEventUtils.java:50), ts_us
    else ts_ms*1000 transaction stamps, delete => deleted_at, and the
    per-dialect position (postgres source.lsn; mysql (file, pos) folded
    via mysql_binlog_lsn with the injector-column parity pair). The
    deterministic ab_id hashes the rendered envelope (no raw line
    exists here).
    """
    after = F.col("after")
    before = F.col("before")
    src = F.col("source")
    base = F.when(after.isNotNull(), after).otherwise(before)
    updated = F.timestamp_micros(
        F.coalesce(src["ts_us"], src["ts_ms"] * F.lit(1000))
    )
    deleted = F.when(after.isNull(), updated)
    value_fields = [f.name for f in df.schema["after"].dataType.fields]
    cols = [base[f].alias(f) for f in value_fields]
    if dialect == "mysql":
        lsn = mysql_binlog_lsn(src["file"], src["pos"])
        injector = [
            src["file"].alias("_ab_cdc_log_file"),
            src["pos"].alias("_ab_cdc_log_pos"),
        ]
    elif dialect == "mssql":
        # Snapshot ('r') envelopes carry change_lsn=null with only
        # commit_lsn set — same coalesce rule as parse_debezium, or
        # snapshot rows decode to a null position and lsn-based epoch
        # planning drops or mis-orders them.
        lsn = mssql_lsn(F.coalesce(src["change_lsn"], src["commit_lsn"]))
        injector = [
            src["commit_lsn"].alias("_ab_cdc_commit_lsn"),
            src["event_serial_no"].alias("_ab_cdc_event_serial_no"),
        ]
    elif dialect == "postgres":
        lsn = src["lsn"]
        injector = []
    else:
        raise ValueError(f"unknown debezium dialect: {dialect!r}")
    extra = [src["table"].alias("_table")] if include_table else []
    passthrough = [
        F.col(c)
        for c in df.columns
        if c not in ("before", "after", "source", "op", "ts_ms")
    ]
    return df.select(
        *cols,
        lsn.alias("_ab_cdc_lsn"),
        updated.alias("_ab_cdc_updated_at"),
        deleted.alias("_ab_cdc_deleted_at"),
        F.col("op").alias("_op"),
        F.md5(
            F.to_json(
                F.struct(before, after, src, F.col("op")),
                {"ignoreNullFields": "false"},
            )
        ).alias("_airbyte_ab_id"),
        updated.alias("_airbyte_emitted_at"),
        *injector,
        *extra,
        *passthrough,
    )

"""JDBC destination: staged tmp-table write + one-transaction publish.

Reference parity (destination-jdbc's buffered-consumer lifecycle,
JdbcBufferedConsumerFactory.java:119-197):

- onStart: create a tmp table per stream (:131-140) — here Spark's JDBC
  writer creates and fills it (one connection PER PARTITION writing
  batched inserts in parallel — the scale path; the reference streams
  every record through one connection).
- recordWriter: batched inserts into the TMP table only (:150-160) —
  readers of the final table never see a half-written sync.
- onClose: a SINGLE transaction publishes tmp -> final (:173-197,
  "executing this query informs the transaction"): truncate-on-
  overwrite + copy, then drop tmp. A crash before COMMIT leaves the
  final table untouched (the reference's atomicity contract).

Sync-mode matrix (DestinationAcceptanceTest semantics):
  overwrite     — DELETE FROM final; INSERT ... SELECT tmp   (:409 —
                  the second sync replaces the first)
  append        — INSERT ... SELECT tmp                      (:508-552
                  — union of syncs)
  append_dedup  — final keeps ONE row per PK, max-cursor wins
                  (:586-660). The per-batch winner is computed in
                  SPARK before staging (winner_window — the same
                  4-impl-equivalence-tested operator the lake MERGE
                  uses), so the SQL side only has to (a) delete final
                  rows beaten by a staged winner, (b) insert staged
                  winners whose PK survived no final row — two
                  statements, one transaction, no window functions
                  required of the target dialect (Derby has no
                  PARTITION BY in ROW_NUMBER).

Ties (staged cursor == final cursor) go to the STAGED row — the later
sync wins, matching the reference's at-least-once overwrite-on-replay
behavior.

Additive schema evolution: columns present in the batch but missing in
final are ALTER TABLE ADD COLUMN'd (nullable) inside the publish
transaction, mirroring the lake layer's additive rule.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from airbyte_integrations_spark.operators.dedup import winner_window
from airbyte_integrations_spark.sources.jdbc import quote_identifier


@dataclass(frozen=True)
class JdbcDestinationConfig:
    url: str
    driver: str | None = None
    user: str | None = None
    password: str | None = None
    batch_size: int = 10_000
    # Cap on staging connections (Spark JDBC `numPartitions`: coalesces
    # the frame before writing). Real databases bound concurrent
    # writers — the reference streams every record through ONE
    # connection; 8 keeps the parallel-stage win without opening a
    # connection per shuffle partition (an embedded/single-node target
    # serializes them anyway, so extra connections are pure overhead).
    write_partitions: int = 8
    options: dict = field(default_factory=dict)


class JdbcDestination:
    """Write DataFrames into a relational database table."""

    def __init__(self, spark: SparkSession, config: JdbcDestinationConfig):
        self.spark = spark
        self.config = config

    # ------------------------------------------------------- connection

    def _connect(self):
        jvm = self.spark._jvm
        c = self.config
        if c.driver:
            jvm.java.lang.Class.forName(c.driver)
        if c.user is not None:
            return jvm.java.sql.DriverManager.getConnection(
                c.url, c.user, c.password or ""
            )
        return jvm.java.sql.DriverManager.getConnection(c.url)

    def _jdbc_props(self) -> dict:
        c = self.config
        props = {"batchsize": str(self.config.batch_size)}
        if c.write_partitions:
            props["numPartitions"] = str(int(c.write_partitions))
        if c.driver:
            props["driver"] = c.driver
        if c.user:
            props["user"] = c.user
        if c.password:
            props["password"] = c.password
        props.update({k: str(v) for k, v in c.options.items()})
        return props

    def _fold(self, conn, name: str) -> str:
        """Fold an unquoted identifier the way the TARGET database
        stores it — via DatabaseMetaData, not a hard-coded case rule:
        Derby/Oracle/DB2 store upper, PostgreSQL stores lower, and a
        mixed-case-storing engine keeps it as-is. Spark's JDBC writer
        emits the tmp-table DDL with an UNQUOTED table name, so the
        publish transaction must reference the name exactly as the
        dialect folded it (a hard-coded .upper() breaks on
        lower-folding dialects like PostgreSQL)."""
        md = conn.getMetaData()
        if md.storesUpperCaseIdentifiers():
            return name.upper()
        if md.storesLowerCaseIdentifiers():
            return name.lower()
        return name

    def _table_exists(self, conn, name: str) -> bool:
        md = conn.getMetaData()
        rs = md.getTables(None, None, self._fold(conn, name), None)
        try:
            return rs.next()
        finally:
            rs.close()

    def _columns(self, conn, name: str) -> list[str]:
        md = conn.getMetaData()
        rs = md.getColumns(None, None, self._fold(conn, name), None)
        out = []
        try:
            while rs.next():
                out.append(rs.getString("COLUMN_NAME"))
        finally:
            rs.close()
        return out

    # ------------------------------------------------------------ check

    def check(self) -> dict:
        """CONNECTION_STATUS probe — AbstractJdbcDestination.check
        (:57-91): verify write permission by creating a table with a
        random name and dropping it again; any failure maps to
        FAILED + message, success to SUCCEEDED."""
        probe = "_airbyte_connection_test_" + uuid.uuid4().hex
        try:
            conn = self._connect()
        except Exception as e:
            return {"status": "FAILED", "message": str(e)[:200]}
        try:
            st = conn.createStatement()
            try:
                st.execute(
                    f"CREATE TABLE {quote_identifier(probe)} (x INTEGER)"
                )
                st.execute(f"DROP TABLE {quote_identifier(probe)}")
            finally:
                st.close()
            return {"status": "SUCCEEDED"}
        except Exception as e:
            return {"status": "FAILED", "message": str(e)[:200]}
        finally:
            conn.close()

    # ------------------------------------------------------------ write

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        primary_key: tuple[str, ...] = (),
        cursor: str | None = None,
        create_table_column_types: str | None = None,
    ) -> None:
        """Stage `df` into a tmp table and publish it to `table` in one
        transaction. mode in {overwrite, append, append_dedup};
        append_dedup requires primary_key + cursor.

        create_table_column_types passes through to Spark's JDBC writer
        (e.g. "url VARCHAR(300)") — needed when the dialect's default
        string mapping is non-comparable (Derby strings become CLOB,
        which its SQL cannot compare in the dedup predicates)."""
        if mode not in ("overwrite", "append", "append_dedup"):
            raise ValueError(f"unknown destination mode: {mode!r}")
        if mode == "append_dedup":
            if not primary_key or cursor is None:
                raise ValueError("append_dedup requires primary_key and cursor")
            # one winner per PK before staging — Spark-side, scales;
            # keeps the publish SQL dialect-minimal. Frames without an
            # _airbyte_ab_id get a deterministic whole-row tiebreak.
            tie_col = "_airbyte_ab_id"
            synthesized = tie_col not in df.columns
            if synthesized:
                from airbyte_integrations_spark.functions.hashing import row_hash

                df = df.withColumn(tie_col, row_hash(df.columns))
            df = winner_window(
                df,
                key=primary_key,
                cursor=cursor,
                secondary=(),
                ab_id=tie_col,
                drop_tombstones=False,
            )
            if synthesized:
                df = df.drop(tie_col)
        tmp = f"airbyte_tmp_{uuid.uuid4().hex[:12]}"
        # Stage: Spark's JDBC writer creates tmp with dialect DDL and
        # writes one connection per partition (parallel inserts).
        props = self._jdbc_props()
        if create_table_column_types:
            props["createTableColumnTypes"] = create_table_column_types
        df.write.jdbc(
            url=self.config.url, table=tmp, mode="errorifexists",
            properties=props,
        )
        conn = self._connect()
        try:
            self._publish(conn, tmp, table, mode, primary_key, cursor, df.columns)
        finally:
            # drop outside the publish tx (Derby DDL inside an aborted
            # tx would roll the drop back anyway); best-effort cleanup
            try:
                st = conn.createStatement()
                st.executeUpdate(
                    f"DROP TABLE {quote_identifier(self._fold(conn, tmp))}"
                )
                st.close()
            except Exception:
                pass
            conn.close()

    # ---------------------------------------------------------- publish

    def _publish(self, conn, tmp, final, mode, primary_key, cursor, batch_cols):
        # Spark's JDBC writer creates columns QUOTED in their original
        # case (JdbcUtils.schemaString -> dialect.quoteIdentifier), so
        # every column reference here must quote the original case;
        # TABLE names are written unquoted (dialect-folded: upper in
        # Derby, lower in PostgreSQL), so they are referenced via the
        # database's own DatabaseMetaData folding rule.
        qtmp = quote_identifier(self._fold(conn, tmp))
        qfinal = quote_identifier(self._fold(conn, final))
        cols = [quote_identifier(c) for c in batch_cols]
        collist = ", ".join(cols)
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            final_created = False
            if not self._table_exists(conn, final):
                # CREATE ... AS SELECT WITH NO DATA clones tmp's dialect
                # types (onStart's createTableQuery analogue)
                st.executeUpdate(
                    f"CREATE TABLE {qfinal} AS SELECT * FROM {qtmp} WITH NO DATA"
                )
                final_created = True
            else:
                # additive evolution: new batch columns appear nullable
                existing = {c for c in self._columns(conn, final)}
                for c in batch_cols:
                    if c not in existing:
                        md = conn.getMetaData()
                        rs = md.getColumns(None, None, self._fold(conn, tmp), c)
                        rs.next()
                        type_name = rs.getString("TYPE_NAME")
                        size = rs.getInt("COLUMN_SIZE")
                        rs.close()
                        decl = (
                            f"{type_name}({size})"
                            if type_name.upper() in ("VARCHAR", "CHAR", "CHARACTER VARYING")
                            else type_name
                        )
                        st.executeUpdate(
                            f"ALTER TABLE {qfinal} ADD COLUMN "
                            f"{quote_identifier(c)} {decl}"
                        )
            if mode == "overwrite":
                # truncate-on-overwrite INSIDE the tx (:173: "truncates
                # the destination table then copies") — DELETE is the
                # transactional spelling (Derby's TRUNCATE autocommits)
                st.executeUpdate(f"DELETE FROM {qfinal}")
                st.executeUpdate(
                    f"INSERT INTO {qfinal} ({collist}) SELECT {collist} FROM {qtmp}"
                )
            elif mode == "append":
                st.executeUpdate(
                    f"INSERT INTO {qfinal} ({collist}) SELECT {collist} FROM {qtmp}"
                )
            else:  # append_dedup — tmp already holds one winner per PK
                pk_eq = " AND ".join(
                    f"t.{quote_identifier(k)} = f.{quote_identifier(k)}"
                    for k in primary_key
                )
                qcur = quote_identifier(cursor)
                # PK indexes turn the two correlated-EXISTS probes from
                # nested-loop O(|final| x |tmp|) scans into index
                # lookups — on index-less engines (embedded Derby) the
                # quadratic probe dominates the whole publish. The
                # final-table index is created once and persists across
                # syncs (the reference's final tables are PK-indexed);
                # the tmp index costs one O(n log n) build per sync.
                pk_cols = ", ".join(quote_identifier(k) for k in primary_key)
                if final_created:
                    st.executeUpdate(
                        f"CREATE INDEX {quote_identifier('ix_' + self._fold(conn, final) + '_pk')} "
                        f"ON {qfinal} ({pk_cols})"
                    )
                st.executeUpdate(
                    f"CREATE INDEX {quote_identifier('ix_' + self._fold(conn, tmp) + '_pk')} "
                    f"ON {qtmp} ({pk_cols})"
                )
                # (a) final rows beaten (or tied) by a staged winner go.
                # A NULL final cursor always loses (it carries no order
                # information; without the OR arm the NULL comparison
                # would keep the stale row AND block the winner's insert)
                st.executeUpdate(
                    f"DELETE FROM {qfinal} f WHERE EXISTS ("
                    f"SELECT 1 FROM {qtmp} t WHERE {pk_eq} "
                    f"AND (t.{qcur} >= f.{qcur} OR f.{qcur} IS NULL))"
                )
                # (b) staged winners whose PK has no surviving final row
                st.executeUpdate(
                    f"INSERT INTO {qfinal} ({collist}) "
                    f"SELECT {collist} FROM {qtmp} t WHERE NOT EXISTS ("
                    f"SELECT 1 FROM {qfinal} f WHERE {pk_eq})"
                )
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            st.close()
            conn.setAutoCommit(True)

"""Catalog/record mappers applied between source and destination.

Reference: AirbyteMapper / NamespacingMapper
(/root/reference/airbyte-workers/src/main/java/io/airbyte/workers/internal/NamespacingMapper.java):
the platform rewrites the destination namespace (SOURCE mirror /
DESTINATION default / CUSTOMFORMAT with ``${SOURCE_NAMESPACE}``
substitution, :44-60,:80-91) and prepends an optional stream prefix
(:93-99) on both the configured catalog and every RECORD message
(:63-78) before anything reaches the destination.

Spark-first mapping: records never pass one-by-one through a mapper —
a stream IS one DataFrame, so only the (namespace, stream-name)
addressing needs rewriting, once per stream. The record payload is
untouched, exactly like the reference (it only touches message
routing fields)."""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NamespaceDefinitionType (io.airbyte.config.JobSyncConfig)
SOURCE = "source"
DESTINATION = "destination"
CUSTOMFORMAT = "customformat"


@dataclass(frozen=True)
class NamespacingMapper:
    """NamespacingMapper.java:25-101 — pure addressing rewrite.

    namespace_definition:
      - "source" (default when unset, :45): keep the source namespace.
      - "destination": namespace -> None, the destination falls back to
        its own configured default (:47-48).
      - "customformat": namespace_format with ``${SOURCE_NAMESPACE}``
        substituted; a blank result falls back to None, mirroring the
        reference's error-log-then-default path (:49-56, :80-91).
    stream_prefix is prepended to every stream name when non-blank
    (:58, :93-99).
    """

    namespace_definition: str = SOURCE
    namespace_format: str | None = None
    stream_prefix: str | None = None

    def __post_init__(self):
        if self.namespace_definition not in (SOURCE, DESTINATION, CUSTOMFORMAT):
            raise ValueError(
                f"unknown namespace_definition: {self.namespace_definition!r}"
            )

    # ------------------------------------------------------- primitives

    def map_namespace(self, source_namespace: str | None) -> str | None:
        """formatNamespace (:80-91) for CUSTOMFORMAT, else the
        SOURCE/DESTINATION arms of mapMessage (:66-74)."""
        if self.namespace_definition == DESTINATION:
            return None
        if self.namespace_definition == CUSTOMFORMAT:
            fmt = self.namespace_format or ""
            if not fmt.strip():
                return None
            out = fmt.replace(
                "${SOURCE_NAMESPACE}",
                source_namespace if (source_namespace or "").strip() else "",
            )
            return out if out.strip() else None
        return source_namespace

    def map_stream_name(self, name: str) -> str:
        """transformStreamName (:93-99)."""
        if self.stream_prefix and self.stream_prefix.strip():
            return self.stream_prefix + name
        return name

    # ------------------------------------------------------ composites

    def map_address(
        self, namespace: str | None, name: str
    ) -> tuple[str | None, str]:
        return self.map_namespace(namespace), self.map_stream_name(name)

    def map_replication_stream(self, rs):
        """Rewrite one ReplicationStream in place of the reference's
        per-message mapMessage (:63-78): the stream name gets the
        prefix; a ``namespace`` destination arg (FilesDestination) gets
        the namespace rule. Destinations without a namespace concept
        (JdbcDestination tables) only see the renamed stream."""
        args = dict(rs.destination_args)
        if "namespace" in args:
            args["namespace"] = self.map_namespace(args["namespace"])
        return replace(
            rs, stream=self.map_stream_name(rs.stream), destination_args=args
        )


# --------------------------------------------------------------------------
# Field-level record mappers (Airbyte "mappers": hashing, field renaming,
# field filtering, row filtering). The reference's platform applies these
# per RECORD message between source and destination; Spark-first, a stream
# is one DataFrame, so each mapper is a column-level transform applied once
# per stream — pure Catalyst projections/filters, no per-row Python. Plug
# the composed transform into `replicate(mapper=record_mapper(...))`.
# --------------------------------------------------------------------------

_HASH_METHODS = {"MD5", "SHA-1", "SHA-256", "SHA-512"}


@dataclass(frozen=True)
class HashingMapper:
    """Hash a field in place: `<field><suffix>` carries the hex digest
    of the string form of the value, the original column is dropped
    (PII leaves the pipe before the destination ever sees it). NULL
    hashes to NULL — a hashed absent value must stay absent, not
    become a constant digest that groups all NULLs together."""

    target_field: str
    method: str = "SHA-256"
    field_name_suffix: str = "_hashed"

    def __post_init__(self):
        if self.method not in _HASH_METHODS:
            raise ValueError(f"unknown hash method: {self.method!r}")

    def _digest(self, col: Column) -> Column:
        s = col.cast("string")
        if self.method == "MD5":
            return F.md5(s)
        if self.method == "SHA-1":
            return F.sha1(s)
        return F.sha2(s, int(self.method.split("-")[1]))

    def apply(self, df: DataFrame) -> DataFrame:
        if self.target_field not in df.columns:
            return df
        out_name = self.target_field + self.field_name_suffix
        return df.withColumn(
            out_name, self._digest(F.col(self.target_field))
        ).drop(self.target_field)


@dataclass(frozen=True)
class FieldRenamingMapper:
    original_field_name: str
    new_field_name: str

    def apply(self, df: DataFrame) -> DataFrame:
        if self.original_field_name not in df.columns:
            return df
        if self.new_field_name in df.columns:
            raise ValueError(
                f"rename target {self.new_field_name!r} already exists"
            )
        return df.withColumnRenamed(
            self.original_field_name, self.new_field_name
        )


@dataclass(frozen=True)
class FieldFilteringMapper:
    """Remove a field entirely (the column never reaches the wire)."""

    target_field: str

    def apply(self, df: DataFrame) -> DataFrame:
        return df.drop(self.target_field)


@dataclass(frozen=True)
class RowFilteringMapper:
    """Keep only rows matching a SQL boolean expression (Airbyte's row
    filtering with an IN condition); negate=True inverts to the OUT
    condition (filter rows matching the expression away). The
    expression is a Catalyst predicate — it pushes down to the scan
    like any user filter."""

    condition: str
    negate: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        pred = F.expr(self.condition)
        return df.filter(~pred if self.negate else pred)


def record_mapper(*mappers) -> "callable":
    """Compose field mappers in order into the `replicate(mapper=...)`
    hook. Order matters exactly as the platform applies them: a rename
    before a hash hashes the renamed column."""

    def apply(df: DataFrame) -> DataFrame:
        for m in mappers:
            df = m.apply(df)
        return df

    return apply

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

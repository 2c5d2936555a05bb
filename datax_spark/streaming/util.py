"""Small shared streaming drain utilities (fixture queries and tests)."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame


def drain_query(q) -> None:
    """Process everything available on a running StreamingQuery, then stop it.

    If the drain fails, the query is best-effort stopped and the ORIGINAL
    failure propagates — stopping an already-failed query rethrows its
    cause, which would otherwise mask the first error. A clean drain that
    then fails to terminate within 60 s raises TimeoutError instead of
    passing silently."""
    try:
        q.processAllAvailable()
    except BaseException:
        try:
            q.stop()
        except Exception:
            pass
        raise
    q.stop()
    if not q.awaitTermination(60):
        raise TimeoutError(f"streaming query {q.name or q.id} did not terminate in 60s")


def drain_to_memory(
    df: DataFrame,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    query_name: str | None = None,
) -> str:
    """Start ``df`` into a memory sink, drain everything available, stop, and
    return the sink table name."""
    name = query_name or f"dsx_mem_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="dsx-memck-"),
        )
        .start()
    )
    drain_query(q)
    return name

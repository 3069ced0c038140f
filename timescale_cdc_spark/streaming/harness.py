"""Deterministic drivers for finite streaming runs (B41-B48 driver
verification and tests).

Structured Streaming semantics — late-row dropping, watermark-gated
emission, cross-batch dedup/state — are only *reproducible* when the
micro-batch decomposition is reproducible. The file source gives us
that lever: it admits files oldest-modification-time-first, up to
``maxFilesPerTrigger`` per batch. :func:`stage_stream_batches` writes
one parquet file per logical batch with strictly increasing mtimes, so
``maxFilesPerTrigger=1`` replays exactly the intended batch sequence —
batch *k* is file *k*, every run, in any session.

Watermark timing facts this module's callers rely on (verified by
execution on Spark 4.1, and by tests/test_streaming_semantics.py):

* The watermark *in effect* during batch ``k`` is computed from the
  event times of batches ``<= k-1`` (monotone max minus the delay).
* Late-row FILTERING in stateful operators uses the one-batch-lagged
  value (SPARK-40925's ``watermarkForLateEvents``): a row in batch
  ``k`` is dropped iff its window end <= max event time over batches
  ``<= k-2`` minus the delay. A late row must therefore arrive two
  batches after the rows that outdate it to be provably dropped.
* Append-mode EMISSION in batch ``k`` evicts (finalizes) windows whose
  end <= the in-effect watermark — so a trailing "flusher" batch is
  what makes previously-completed windows reach the sink.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

#: Fixed mtime base for staged batch files. Any constant works — only
#: the per-file ordering matters — and a constant keeps reruns of the
#: same staging byte-and-metadata identical.
_MTIME_BASE = 1_700_000_000


def stage_stream_batches(parts: list[DataFrame], path: str) -> str:
    """Write each frame in ``parts`` as ONE parquet file under
    ``path`` with strictly increasing modification times, so a file
    source with ``maxFilesPerTrigger=1`` consumes them as micro-batch
    0..n-1 in list order. Returns ``path``.

    Each part goes through ``coalesce(1)`` — these are test/driver
    corpora (fixture subsets), not production data; the single file IS
    the batch boundary.
    """
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    stage = path + "__stage"
    for i, part in enumerate(parts):
        shutil.rmtree(stage, ignore_errors=True)
        part.coalesce(1).write.parquet(stage)
        files = glob.glob(os.path.join(stage, "part-*.parquet"))
        if len(files) != 1:  # coalesce(1) => exactly one task/file
            raise RuntimeError(f"expected 1 part file, got {files}")
        dest = os.path.join(path, f"b{i:04d}.parquet")
        shutil.copyfile(files[0], dest)
        t = _MTIME_BASE + i * 100
        os.utime(dest, (t, t))
    shutil.rmtree(stage, ignore_errors=True)
    return path


def run_to_completion(query: StreamingQuery, timeout_s: int = 600) -> None:
    """Await an availableNow streaming query; surface failures as
    exceptions instead of silent partial sinks."""
    finished = query.awaitTermination(timeout_s)
    if not finished:
        query.stop()
        raise TimeoutError(
            f"streaming query {query.name or query.id} did not finish "
            f"within {timeout_s}s"
        )
    # exception() is None on clean termination
    exc = query.exception()
    if exc is not None:
        raise RuntimeError(f"streaming query failed: {exc}")

"""Query registry package. Importing this package populates
QUERIES/ORACLES from every query module (the driver contract in
__spark_entry__.py reads them verbatim)."""

from timescale_cdc_spark.queries.base import ORACLES, QUERIES, register

# Populate the registry (import order = registry order). Round 2: the
# registry is consolidated to exactly 50 entries — one per SURVEY §2
# operator family — so EVERY entry lands inside the driver's
# correctness window (round 1 registered 80 and the driver evaluated
# only the first 50, leaving all Tier C entries without a hard
# correctness signal). Round 6 regressed to 52 (two streaming-gate
# entries pushed c5_multimodal/sql_surface_portable out); round 7
# merged the B27 pair and folded the vector gate into c3_ann_lsh_ivf
# to get back to 50 — tests/test_oracle_parity.py now pins
# len(QUERIES) <= 50 so the overflow can never silently recur.
from timescale_cdc_spark.queries import relational  # noqa: E402,F401
from timescale_cdc_spark.queries import functions_surface  # noqa: E402,F401
from timescale_cdc_spark.queries import cdc_queries  # noqa: E402,F401
from timescale_cdc_spark.queries import llm_queries  # noqa: E402,F401
from timescale_cdc_spark.queries import sql_surface  # noqa: E402,F401
# Round 8: library-family entries (state/heartbeat/freq,
# stats/counter/candle rollups, M4 + split/sample) — slots freed by
# the b33+b39 / b18+b24 / a15+a16 merges keep the registry at 50.
from timescale_cdc_spark.queries import library  # noqa: E402,F401
# Round 12: real streaming runs under the oracle gate (B41-B48) — the
# slot freed by the b43+b44 merge keeps the registry at 50.
from timescale_cdc_spark.queries import streaming_semantics  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]

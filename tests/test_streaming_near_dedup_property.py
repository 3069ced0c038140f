"""Property-style invariants for the streaming near-dup gate
(operators/curation.py::StreamingNearDedup), following the seeded-
random pattern of test_replay_property.py: for random corpora with
planted exact-duplicate groups and a random 3-way batch split,

1. every planted group admits EXACTLY one member (exact copies share
   every band, so detection is deterministic),
2. all unique documents are admitted,
3. the admitted set contains zero near-dup candidate pairs at the
   gate's threshold (the same invariant the registered query checks
   in-plan),
4. replaying any batch id leaves the admitted set and index unchanged.
"""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.curation import StreamingNearDedup
from timescale_cdc_spark.operators.dedup import minhash_lsh_pairs

VOCAB = [f"w{i:03d}" for i in range(1000)]


def _corpus(seed: int):
    """~30 unique docs + 5 exact-copy groups (sizes 2-4). Returns
    (rows, groups) where groups maps a group key to its member ids."""
    rng = random.Random(seed)
    rows, groups = [], {}
    doc_id = 0
    for _ in range(30):
        rows.append((doc_id, " ".join(rng.sample(VOCAB, 25))))
        doc_id += 1
    for g in range(5):
        text = " ".join(rng.sample(VOCAB, 25))
        members = []
        for _ in range(rng.randint(2, 4)):
            rows.append((doc_id, text))
            members.append(doc_id)
            doc_id += 1
        groups[g] = members
    rng.shuffle(rows)
    return rows, groups


@pytest.mark.slow
def test_streaming_near_dedup_invariants(spark, tmp_path):
    for seed in (11, 29, 47):
        rows, groups = _corpus(seed)
        rng = random.Random(seed * 7)
        batches = {0: [], 1: [], 2: []}
        for row in rows:
            batches[rng.randrange(3)].append(row)

        gate = StreamingNearDedup(spark, str(tmp_path / f"idx_{seed}"))
        admitted: set[int] = set()
        batch_survivors = {}
        for b in range(3):
            df = spark.createDataFrame(
                batches[b] or [(999999, "placeholder empty batch text")],
                "doc_id long, text string",
            )
            if not batches[b]:
                df = df.filter(F.lit(False))
            got = {r.doc_id for r in gate.process_batch(df, b).collect()}
            batch_survivors[b] = got
            admitted |= got

        member_ids = {m for ms in groups.values() for m in ms}
        # 1. exactly one member per exact-copy group
        for g, ms in groups.items():
            assert len(admitted & set(ms)) == 1, (seed, g, ms, admitted & set(ms))
        # 2. every unique doc admitted
        unique_ids = {r[0] for r in rows} - member_ids
        assert unique_ids <= admitted, (seed, unique_ids - admitted)

        # 3. no surviving candidate pair at the threshold
        adm_df = spark.createDataFrame(
            [r for r in rows if r[0] in admitted], "doc_id long, text string"
        )
        n_viol = minhash_lsh_pairs(
            adm_df, "text", "doc_id", threshold=gate.threshold
        ).count()
        assert n_viol == 0, (seed, n_viol)

        # 4. replaying batch 1 is idempotent
        df1 = spark.createDataFrame(
            batches[1] or [(999999, "placeholder empty batch text")],
            "doc_id long, text string",
        )
        if not batches[1]:
            df1 = df1.filter(F.lit(False))
        replay = {r.doc_id for r in gate.process_batch(df1, 1).collect()}
        assert replay == batch_survivors[1], (seed, replay, batch_survivors[1])
        idx_ids = {
            r._id for r in gate.index().select("_id").distinct().collect()
        }
        assert idx_ids == admitted, (seed, idx_ids ^ admitted)

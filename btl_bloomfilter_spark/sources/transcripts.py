"""Deterministic synthetic conversation-transcript table.

Shape per BASELINE.json ``input_hint``:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Generation rules per FIXTURES.md §1, seed=42 convention:
- conv sizes ~ seeded geometric in [1, 64]
- roles cycle user/assistant/tool/system weighted 40/40/15/5
- text: seeded token stream over a 512-word vocab, 5-200 tokens/turn;
  ~1% of turns carry a planted sentinel n-gram (membership positives);
  the zz-prefixed negative vocab is NEVER emitted
- tool: null unless role=='tool', else Zipf(s≈1.2) over 50 names
- 10% of conversations share 16 hot conv_id prefixes (skew exercise)
- ts strictly increasing within a conv (base + conv offset + 7s/turn)

Generation is distributed: ``spark.range(n_convs)`` → ``mapInPandas``
with a per-conversation seeded Generator, so the same (seed, conv)
always produces identical rows regardless of partitioning — the
per-turn text-equality invariant is testable on any cluster layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

VOCAB = [f"word{i:03d}" for i in range(512)]
SENTINELS = [f"sentinel{i:02d}gram alpha{i:02d} bravo{i:02d}" for i in range(20)]
TOOLS = [f"tool{i:02d}" for i in range(50)]
ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_W = np.array([0.40, 0.40, 0.15, 0.05])
HOT_PREFIXES = 16
BASE_TS = np.datetime64("2026-01-01T00:00:00")


def _conv_rows(conv: int, seed: int) -> dict:
    with np.errstate(over="ignore"):  # uint64 wrap is the intended mix
        mix = np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(conv)
    rng = np.random.default_rng(mix)
    # geometric support is {1, 2, ...} already — FIXTURES.md specifies
    # conv sizes in [1, 64] including single-turn conversations
    n_turns = int(min(64, rng.geometric(0.12)))
    if rng.random() < 0.10:
        cid = f"hot{int(rng.integers(HOT_PREFIXES)):02d}-conv{conv:08d}"
    else:
        cid = f"conv{conv:08d}"
    roles = ROLES[rng.choice(4, size=n_turns, p=ROLE_W)]
    lens = rng.integers(5, 201, size=n_turns)
    texts = []
    for t in range(n_turns):
        toks = [VOCAB[i] for i in rng.integers(0, len(VOCAB), lens[t])]
        if rng.random() < 0.01:
            toks.append(SENTINELS[int(rng.integers(len(SENTINELS)))])
        texts.append(" ".join(toks))
    zipf = np.minimum(rng.zipf(1.2, size=n_turns), len(TOOLS)) - 1
    tools = [TOOLS[int(z)] if r == "tool" else None for r, z in zip(roles, zipf)]
    conv_offset = int(rng.integers(0, 86_400 * 30))
    ts = BASE_TS + np.timedelta64(conv_offset, "s") + np.arange(n_turns) * np.timedelta64(7, "s")
    return {
        "conv_id": [cid] * n_turns,
        "turn_idx": np.arange(n_turns, dtype=np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    }


def transcripts_df(spark: SparkSession, n_convs: int, *, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic transcripts DataFrame."""

    def gen(batches):
        for pdf in batches:
            frames = [pd.DataFrame(_conv_rows(int(c), seed)) for c in pdf["id"]]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    base = spark.range(n_convs)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, SCHEMA)


def transcripts_pdf(n_convs: int, *, seed: int = 42) -> pd.DataFrame:
    """Driver-local generation (tiny fixtures) — identical rows."""
    return pd.concat([pd.DataFrame(_conv_rows(c, seed)) for c in range(n_convs)], ignore_index=True)


def negative_corpus(n: int, *, seed: int = 43) -> list[str]:
    """Disjoint-vocab strings, never inserted anywhere (FPR controls)."""
    rng = np.random.default_rng(seed)
    vocab = [f"zz{i:03d}" for i in range(512)]
    return [" ".join(vocab[i] for i in rng.integers(0, 512, rng.integers(5, 40))) for _ in range(n)]

"""Structured Streaming sketch accumulation.

The reference is a batch library (SURVEY §2.8) and the north rule is
batch too, but every sketch here is an associative, commutative
accumulator, so streaming ingestion is just: per micro-batch build
partials (same mapInPandas kernel as batch) → merge into a persisted
running sketch.  `foreachBatch` gives exactly-once micro-batch
semantics with the stream's own checkpointing; the running sketch is
re-persisted atomically per batch (write-new + rename).

This is the `applyInPandasWithState`-free design: state is one
bounded blob (m bits / registers), not per-key rows, so a single
driver-side merge per micro-batch is cheaper than a keyed state
store.  For per-key streaming sketches use plans.agg.sketch_by_key
inside foreachBatch the same way.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame

from ..operators.base import Sketch
from ..plans.agg import partial_sketches


def merge_batch_into(
    running_path: str | Path,
    batch_df: DataFrame,
    col: str,
    make_sketch: Callable[[], Sketch],
    *,
    fanin: int = 16,
) -> Sketch:
    """Build a sketch of batch_df[col] and merge it into the sketch
    persisted at running_path (created if absent).  Atomic replace."""
    running_path = Path(running_path)
    partials = partial_sketches(batch_df, col, make_sketch)
    rows = partials.collect()  # micro-batches are small; no tree needed
    if not rows:
        return (
            Sketch.deserialize(running_path.read_bytes()) if running_path.exists() else make_sketch()
        )
    batch_sketch = Sketch.merge_blobs([bytes(r["blob"]) for r in rows])
    if running_path.exists():
        running = Sketch.deserialize(running_path.read_bytes())
        running.merge(batch_sketch)
    else:
        running = batch_sketch
    tmp = running_path.with_suffix(".tmp")
    tmp.write_bytes(running.serialize())
    os.replace(tmp, running_path)
    return running


def stream_build_sketch(
    stream_df: DataFrame,
    col: str,
    make_sketch: Callable[[], Sketch],
    *,
    state_path: str | Path,
    checkpoint_dir: str | Path,
    trigger_available_now: bool = True,
):
    """readStream → foreachBatch(accumulate) → running sketch on disk.

    Returns the StreamingQuery; callers await termination then load
    the final sketch with ``Sketch.deserialize(Path(state_path).read_bytes())``.
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into(state_path, batch_df, col, make_sketch)

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", str(checkpoint_dir))
        .foreachBatch(on_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def load_running(state_path: str | Path) -> Sketch:
    return Sketch.deserialize(Path(state_path).read_bytes())

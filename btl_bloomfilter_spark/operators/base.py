"""Mergeable-sketch protocol.

Every sketch in this library is an associative, commutative
accumulator with the shape the reference's shared-memory atomic
inserts imply (`BloomFilter.hpp:177-194`: N threads OR-ing into one
array ≡ N private arrays ORed afterwards):

    zero(params) → update(batch)* → serialize → [shuffle] →
    merge(a, b)* → finalize

That shape is exactly what Spark needs for a distributed build:
per-partition states via ``mapInPandas`` (Arrow batches, no per-row
Python) + tree-wise merge (plans/agg.py).  Subclasses must guarantee
``merge`` is associative+commutative and ``update`` order-independent
(verified by tests/test_merge_laws.py under partition permutations).
"""

from __future__ import annotations

import json
import struct
from abc import ABC, abstractmethod
from typing import Any


class Sketch(ABC):
    """Driver/executor-side sketch state (numpy-backed)."""

    #: subclass registry for envelope deserialization
    _registry: dict[str, type["Sketch"]] = {}

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        Sketch._registry[cls.__name__] = cls

    # -- accumulation ------------------------------------------------
    @abstractmethod
    def update(self, values) -> None:
        """Absorb a batch of values (pd.Series / np.ndarray / list)."""

    @abstractmethod
    def merge(self, other: "Sketch") -> "Sketch":
        """In-place merge of an equal-parameter sketch; returns self."""

    def metrics(self) -> dict[str, Any]:
        """Fill/occupancy metrics logged per partition (north_rule)."""
        return {}

    # -- state transport ---------------------------------------------
    @abstractmethod
    def state_bytes(self) -> bytes:
        """Raw state payload (no params)."""

    @abstractmethod
    def load_state(self, payload: bytes) -> None: ...

    @abstractmethod
    def params(self) -> dict[str, Any]:
        """JSON-able constructor parameters."""

    @classmethod
    def from_params(cls, p: dict[str, Any]) -> "Sketch":
        return cls(**p)

    # -- envelope: self-describing bytes -----------------------------
    def serialize(self) -> bytes:
        head = json.dumps(
            {"cls": type(self).__name__, "mod": type(self).__module__, "params": self.params()}
        ).encode()
        return struct.pack("<I", len(head)) + head + self.state_bytes()

    @staticmethod
    def deserialize(blob: bytes) -> "Sketch":
        (hlen,) = struct.unpack_from("<I", blob)
        head = json.loads(blob[4 : 4 + hlen])
        if head["cls"] not in Sketch._registry and head.get("mod"):
            # fresh worker process: subclass module not yet imported
            import importlib

            importlib.import_module(head["mod"])
        sk = Sketch._registry[head["cls"]].from_params(head["params"])
        sk.load_state(blob[4 + hlen :])
        return sk

    def compatible(self, other: "Sketch") -> bool:
        return type(self) is type(other) and self.params() == other.params()

    def _require_compatible(self, other: "Sketch") -> None:
        if not self.compatible(other):
            raise ValueError(
                f"incompatible sketches: {type(self).__name__}{self.params()} "
                f"vs {type(other).__name__}{other.params()}"
            )

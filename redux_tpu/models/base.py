"""Model protocol: the codec↔model contract.

Mirrors the reference ``Model`` trait (``/root/reference/src/model/mod.rs:17-29``):
the codec only ever talks to a model through these four methods (plus the
debug frequency-table hook used by differential tests, model/mod.rs:27-28).

This is the HOST-path contract (``oracle.compress``/``compress_bytes``).
The same trait on the jit device path is ``ops.generic.JaxModel`` — the
four methods as pure lane-batched JAX functions over a state pytree.
"""

from __future__ import annotations

import abc
from typing import List, Tuple

from ..params import Parameters


class Model(abc.ABC):
    """Probability model driving the arithmetic coder (model/mod.rs:17-29)."""

    params: Parameters

    @abc.abstractmethod
    def total_frequency(self) -> int:
        """Maximum cumulative frequency (model/mod.rs:21)."""

    @abc.abstractmethod
    def get_frequency(self, symbol: int) -> Tuple[int, int]:
        """Cumulative range ``(low, high)`` for ``symbol``; adapts (model/mod.rs:23)."""

    @abc.abstractmethod
    def get_symbol(self, value: int) -> Tuple[int, int, int]:
        """Inverse lookup ``(symbol, low, high)`` for ``value``; adapts (model/mod.rs:25)."""

    @abc.abstractmethod
    def get_freq_table(self) -> List[Tuple[int, int]]:
        """Full per-symbol ``(low, high)`` table for debugging (model/mod.rs:27-28)."""

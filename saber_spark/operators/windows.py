"""Window definitions and pane math.

Mirrors the reference's window model (reference ``WindowDefinition.java``):
two kinds — RANGE_BASED (event-time, seconds) and ROW_BASED (count) — with
``(size, slide)``; tumbling iff ``size == slide``; pane decomposition
``pane = gcd(size, slide)`` (reference ``WindowDefinition.java:28-57``).

On Spark, RANGE windows map to ``F.window(ts, size, slide)`` directly.
ROW windows have no Spark primitive; they are expressed over the dense
per-conversation ``turn_idx`` (tumbling: ``floor(turn_idx/size)``;
sliding: slide-bucket fan-out, see ``aggregation.py``). Pane math feeds
the pane-partial aggregation layer (``panes.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

ROW = "row"
RANGE = "range"


@dataclass(frozen=True)
class WindowDef:
    """(kind, size, slide): kind='range' → seconds; kind='row' → tuples."""

    kind: str
    size: int
    slide: int | None = None

    def __post_init__(self) -> None:
        if self.kind not in (ROW, RANGE):
            raise ValueError(f"window kind must be '{ROW}'|'{RANGE}', got {self.kind!r}")
        if self.slide is None:
            object.__setattr__(self, "slide", self.size)
        if self.size <= 0 or self.slide <= 0 or self.slide > self.size:
            raise ValueError(f"need 0 < slide <= size, got size={self.size} slide={self.slide}")

    @property
    def is_tumbling(self) -> bool:
        return self.size == self.slide

    @property
    def pane_size(self) -> int:
        """gcd slide-decomposition (reference WindowDefinition.java:28-33)."""
        return math.gcd(self.size, self.slide)

    @property
    def num_panes(self) -> int:
        return self.size // self.pane_size

    @property
    def panes_per_slide(self) -> int:
        return self.slide // self.pane_size

    @property
    def windows_per_row(self) -> int:
        """How many window instances each row belongs to (size/slide if divisible)."""
        return -(-self.size // self.slide)

    def range_window_col(self, ts_col: str = "ts") -> Column:
        """Native Spark event-time window struct (start/end timestamps)."""
        if self.kind != RANGE:
            raise ValueError("range_window_col requires a RANGE window")
        if self.is_tumbling:
            return F.window(F.col(ts_col), f"{self.size} seconds")
        return F.window(F.col(ts_col), f"{self.size} seconds", f"{self.slide} seconds")

    def row_window_id(self, idx_col: str = "turn_idx") -> Column:
        """Tumbling count-window id over a dense per-key index."""
        if self.kind != ROW or not self.is_tumbling:
            raise ValueError("row_window_id covers tumbling ROW windows only")
        return F.floor(F.col(idx_col) / F.lit(self.size)).cast("long")

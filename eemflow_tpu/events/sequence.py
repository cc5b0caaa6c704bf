"""Event sequence container (single canonical copy — the reference has three:
``loader/loader_utils.py:352``, ``:540``, ``utils_luo/event_utils.py:255``)."""

from __future__ import annotations

import numpy as np


class EventSequence:
    """N×4 [ts, x, y, p] array wrapper.

    Sorts by timestamp, optionally scales timestamps (e.g. s → µs) and
    converts absolute to relative time.  Mirrors reference semantics at
    ``loader/loader_utils.py:352-397``.
    """

    def __init__(
        self,
        features: np.ndarray | None,
        height: int,
        width: int,
        timestamp_multiplier: float | None = None,
        convert_to_relative: bool = False,
    ):
        if features is None:
            features = np.zeros((1, 4), dtype=np.float64)
        self.features = np.asarray(features, dtype=np.float64)
        self.image_height = height
        self.image_width = width
        if not self.is_sorted():
            self.sort_by_timestamp()
        if timestamp_multiplier is not None:
            self.features[:, 0] *= timestamp_multiplier
        if convert_to_relative:
            self.absolute_time_to_relative()

    def __len__(self) -> int:
        return len(self.features)

    def __add__(self, other: "EventSequence") -> "EventSequence":
        return EventSequence(
            np.concatenate([self.features, other.features]),
            height=self.image_height,
            width=self.image_width,
        )

    def is_sorted(self) -> bool:
        return bool(np.all(self.features[:-1, 0] <= self.features[1:, 0]))

    def sort_by_timestamp(self) -> None:
        if len(self.features) > 0:
            self.features = self.features[np.argsort(self.features[:, 0])]

    def absolute_time_to_relative(self) -> None:
        if len(self.features) > 0:  # empty frame interval (static scene)
            self.features[:, 0] -= self.features[:, 0].min()

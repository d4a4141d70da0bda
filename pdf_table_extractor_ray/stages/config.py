"""Per-strategy extraction configuration.

The reference carries rich per-bank constants — camelot
``table_areas`` and column x-coordinates per page class
(conversor_itau.py:187-199, Conversor.py:219), skip-word lists, and
document passwords (conversor_c6.py:36,109). The engine's analog is a
frozen dataclass plumbed to the warm actor pool via
``fn_constructor_kwargs``: registered once per job, resident per
actor, never shipped per batch.

A user registering a new strategy can pair it with a non-default
``StrategyConfig`` (different column thresholds, extra skip words,
credentials for encrypted payloads) without touching engine code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Tuple

# Layout parameters of conversor_banestes.py:30-31 (the per-bank
# column x-coordinate constants the reference hardcodes per converter).
DEFAULT_COLUMN_DATE_END_X = 75.0
DEFAULT_COLUMN_VALUE_START_X = 480.0

# password the fixture corpus encrypts with (≈ the hardcoded document
# password of conversor_c6.py:36)
DEFAULT_CREDENTIALS: Mapping[str, str] = {"default": "pdfx-demo"}


@dataclass(frozen=True)
class StrategyConfig:
    """Immutable per-job strategy parameters.

    - ``column_date_end_x`` / ``column_value_start_x``: x-coordinate
      column boundaries for the coordinate_columns strategy (the
      ``table_areas`` analog).
    - ``extra_skip_words``: additional boilerplate skip words merged
      into the statement strategies' filters.
    - ``credentials``: payload passwords keyed by realm (``"default"``
      applies when no realm matches) — consumed by the encrypted
      strategy (S6).
    """

    column_date_end_x: float = DEFAULT_COLUMN_DATE_END_X
    column_value_start_x: float = DEFAULT_COLUMN_VALUE_START_X
    extra_skip_words: Tuple[str, ...] = ()
    credentials: Mapping[str, str] = field(
        default_factory=lambda: dict(DEFAULT_CREDENTIALS)
    )

    def password_for(self, url: str | None) -> str | None:
        """Longest-prefix credential match on the url, falling back to
        the ``"default"`` realm."""
        if url:
            best = None
            for realm, pw in self.credentials.items():
                if realm != "default" and url.startswith(realm):
                    if best is None or len(realm) > len(best[0]):
                        best = (realm, pw)
            if best:
                return best[1]
        return self.credentials.get("default")


DEFAULT_CONFIG = StrategyConfig()

"""Webtext quality signals as first-class constraint rules: the same
row-local signals `operators/quality.py` composes into a filter chain,
re-expressed in the suite DSL so they fold into pass-1's single wide
aggregate alongside schema/row rules, ride the registry/lockfile identity
model, and emit the standard verdict + violation rows.

Engine analog: the reference runs its quality heuristics inside the same
validation pass as its schema checks (ref: transcription/
conversation_physics.py quality gates sitting beside the model
validators); here a ``Quality`` rule is just another RowRule — zero extra
scans at any scale.

NULL handling: a NULL text measures NULL on every signal, which fails the
rule (coalesce-to-False) — a row with no body cannot demonstrate quality;
pair with ``NotNull`` when the distinction matters. ``max_dup3_fraction``
passes vacuously on docs shorter than 3 tokens (the signal is undefined
there, matching the chain's semantics).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from slower_whisper_spark.rules.base import RowRule, _str

KINDS = (
    "min_tokens", "max_tokens", "max_punct_ratio",
    "min_stopword_ratio", "max_dup3_fraction", "lang_allowed",
)


class Quality(RowRule):
    """One quality signal as a constraint.

    ``kind`` ∈ KINDS; ``value`` is the threshold (unused for
    ``lang_allowed``, which takes ``langs``). ``column`` is the text
    column (or the lang column for ``lang_allowed``).
    """

    def __init__(
        self,
        kind: str,
        column: str = "text",
        value: float | None = None,
        langs: tuple[str, ...] = ("en",),
        rule_id: str | None = None,
    ):
        if kind not in KINDS:
            raise ValueError(f"unknown quality kind {kind!r}; use one of {KINDS}")
        if kind != "lang_allowed" and value is None:
            raise ValueError(f"quality kind {kind!r} needs a threshold value")
        self.kind = kind
        self.column = column
        self.value = value
        self.langs = tuple(langs)
        self.rule_id = rule_id or f"quality_{kind}({column})"

    def spec(self) -> dict[str, Any]:
        return {
            "type": "quality",
            "kind": self.kind,
            "column": self.column,
            "value": self.value,
            "langs": list(self.langs),
            "rule_id": self.rule_id,
        }

    def _signal(self) -> Column:
        from slower_whisper_spark.functions.text import (
            duplicate_ngram_fraction,
            punct_ratio,
            stopword_ratio,
            token_count,
        )

        c = F.col(self.column)
        if self.kind in ("min_tokens", "max_tokens"):
            return token_count(c)
        if self.kind == "max_punct_ratio":
            return F.round(punct_ratio(c), 6)
        if self.kind == "min_stopword_ratio":
            return F.round(stopword_ratio(c), 6)
        if self.kind == "max_dup3_fraction":
            return F.round(duplicate_ngram_fraction(c, 3), 6)
        return F.col(self.column)  # lang_allowed

    def predicate(self) -> Column:
        s = self._signal()
        v = self.value
        if self.kind == "min_tokens":
            raw = s >= int(v)
        elif self.kind == "max_tokens":
            raw = s <= int(v)
        elif self.kind == "max_punct_ratio":
            raw = s <= float(v)
        elif self.kind == "min_stopword_ratio":
            raw = s >= float(v)
        elif self.kind == "max_dup3_fraction":
            # undefined (<3 tokens) passes vacuously — coalesce True
            return F.coalesce(s <= float(v), F.lit(True))
        else:  # lang_allowed
            raw = s.isin(*self.langs)
        return F.coalesce(raw, F.lit(False))

    def observed(self) -> Column:
        return _str(self._signal())

    def expected(self) -> Column:
        if self.kind == "lang_allowed":
            return F.lit(f"lang in {sorted(self.langs)}")
        op = {"min_tokens": ">=", "max_tokens": "<=", "max_punct_ratio": "<=",
              "min_stopword_ratio": ">=", "max_dup3_fraction": "<="}[self.kind]
        return F.lit(f"{self.kind.split('_', 1)[1]} {op} {self.value}")


def quality_rules(
    *,
    text_col: str = "text",
    lang_col: str | None = None,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    max_punct_ratio: float | None = None,
    min_stopword_ratio: float | None = None,
    max_dup3_fraction: float | None = None,
    allowed_langs: tuple[str, ...] = ("en",),
) -> list[Quality]:
    """The filter chain's thresholds as a rule list — drop it into a
    ConstraintSuite next to schema rules and the whole chain costs zero
    extra scans."""
    out: list[Quality] = []
    if min_tokens is not None:
        out.append(Quality("min_tokens", text_col, min_tokens))
    if max_tokens is not None:
        out.append(Quality("max_tokens", text_col, max_tokens))
    if max_punct_ratio is not None:
        out.append(Quality("max_punct_ratio", text_col, max_punct_ratio))
    if min_stopword_ratio is not None:
        out.append(Quality("min_stopword_ratio", text_col, min_stopword_ratio))
    if max_dup3_fraction is not None:
        out.append(Quality("max_dup3_fraction", text_col, max_dup3_fraction))
    if lang_col is not None:
        out.append(Quality("lang_allowed", lang_col, langs=allowed_langs))
    return out

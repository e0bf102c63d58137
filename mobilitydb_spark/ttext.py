"""Temporal text (ttext) — SURVEY §2.7
(`src/temporal_textfuncs.c:50-117`: ``||`` textcat, upper, lower).

Strings ride the numeric engine as **vocab codes**: a TText is a
stepwise ``Temporal`` whose float values index into a string vocab.
Every existing kernel (restriction, sync, ever/always, aggregation
by min/max code order) applies unchanged; text-specific ops remap the
vocab.  ttext is always stepwise (`ensure_linear_interpolation`
excludes it, temporal.h:320)."""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from .lifting import synchronize
from .types import (INSTANT, INSTANTSET, SEQUENCE, SEQUENCESET, Seq,
                    Temporal, fmt_ts, parse_ts)


@dataclass
class TText:
    temporal: Temporal          # stepwise, dim=1, values = vocab codes
    vocab: list[str]

    # -- parsing (grammar of temporal_parser.c with text values) ------
    @staticmethod
    def parse(text: str) -> "TText":
        s = text.strip()
        vocab: list[str] = []

        def code(word: str) -> float:
            word = word.strip().strip('"')
            if word not in vocab:
                vocab.append(word)
            return float(vocab.index(word))

        # replace every value@ts token's value with its code
        def sub(m):
            return f"{code(m.group(1))}@{m.group(2)}"

        numeric = re.sub(r"([^@{}\[\](),]+)@([^,{}\[\]()]+)", sub, s)
        from .types import parse_temporal
        # Parse with stepwise semantics so normalize_instants only merges
        # repeated values — a linear parse would drop any instant whose
        # vocab code happens to be collinear in time (ttext is always
        # stepwise, temporal.h:320).
        tv = parse_temporal("Interp=Stepwise;" + numeric)
        tv.step_default = True
        return TText(tv, vocab)

    def _remap(self, fn) -> "TText":
        new_vocab = [fn(w) for w in self.vocab]
        return TText(self.temporal, new_vocab)

    def upper(self) -> "TText":
        return self._remap(str.upper)

    def lower(self) -> "TText":
        return self._remap(str.lower)

    def value_at(self, t: int) -> str | None:
        v = self.temporal.value_at(t)
        return None if v is None else self.vocab[int(round(v[0]))]

    def concat(self, other: "TText") -> "TText":
        """textcat ``||``: synchronized step concatenation."""
        pieces = synchronize(self.temporal, other.temporal)
        if not pieces:
            return TText(Temporal(INSTANT, [], False, 0, True), [])
        vocab: list[str] = []
        cache: dict[str, int] = {}

        def code(word: str) -> float:
            if word not in cache:
                cache[word] = len(vocab)
                vocab.append(word)
            return float(cache[word])

        seqs = []
        for ts, va, vb, lo, hi in pieces:
            joined = [code(self.vocab[int(round(a[0]))]
                           + other.vocab[int(round(b[0]))])
                      for a, b in zip(va, vb)]
            seqs.append(Seq(ts, np.array(joined)[:, None], lo, hi))
        a, b = self.temporal, other.temporal
        if a.duration == INSTANT or b.duration == INSTANT:
            dur = INSTANT
        elif a.duration == INSTANTSET or b.duration == INSTANTSET:
            dur = INSTANTSET
        elif a.duration == SEQUENCE and b.duration == SEQUENCE:
            dur = SEQUENCE
        else:
            # a sequence-set operand keeps the result a sequence set
            # even when one piece survives (sync_tfunc returns
            # TemporalS; 27-suite golden braces a single sequence)
            dur = SEQUENCESET
        return TText(Temporal(dur, seqs, False, 0, True), vocab)

    def at_value(self, word: str) -> "TText | None":
        from .restrict import at_value
        if word not in self.vocab:
            return None
        got = at_value(self.temporal, float(self.vocab.index(word)))
        return None if got is None else TText(got, self.vocab)

    def ever_eq(self, word: str) -> bool:
        if word not in self.vocab:
            return False
        from .everops import ever
        return ever("eq", self.temporal, float(self.vocab.index(word)))

    def __str__(self) -> str:
        tv = self.temporal

        def inst(s: Seq, i: int) -> str:
            return (f'"{self.vocab[int(round(s.values[i, 0]))]}"'
                    f"@{fmt_ts(s.times[i])}")

        def seq(s: Seq) -> str:
            body = ", ".join(inst(s, i) for i in range(len(s.times)))
            return f"{'[' if s.lower_inc else '('}{body}" \
                   f"{']' if s.upper_inc else ')'}"

        if tv.duration == INSTANT:
            return inst(tv.seqs[0], 0)
        if tv.duration == INSTANTSET:
            return "{" + ", ".join(inst(s, 0) for s in tv.seqs) + "}"
        if tv.duration == SEQUENCE:
            return seq(tv.seqs[0])
        return "{" + ", ".join(seq(s) for s in tv.seqs) + "}"

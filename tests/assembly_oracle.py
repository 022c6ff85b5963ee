"""Independent pure-Python implementation of the merge spec (test oracle).

Implements the interval-merge case analysis documented in SURVEY.md §2.A
R7a-R7f (reference: assembly_final.cpp:469-595) directly from the spec,
with no Spark involved, so the Spark fold can be validated against it on
arbitrary generated inputs.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Interval:
    offset: int
    length: int
    content: str


def merge_step(acc: Interval, nxt: Interval, bit_compat: bool = False) -> Interval:
    o, l, c = acc.offset, acc.length, acc.content
    on, ln, cn = nxt.offset, nxt.length, nxt.content
    e = o + l - 1
    en = on + ln - 1
    if on + ln <= o:  # A1: entirely before, gap >= 0
        gap = o - on - ln
        return Interval(on, l + gap + ln, cn + "N" * gap + c)
    if on < o and en > e:  # A2: covers
        return Interval(on, ln, cn)
    if on < o:  # A3: starts before, ends inside
        plen = (ln - 1) if bit_compat else (o - on)
        return Interval(on, l + plen, cn[:plen] + c)
    if on < e:  # B: starts strictly inside
        if en > e:
            return Interval(o, l + (en - e), c + cn[e + 1 - on :])
        return acc  # B': contained, no-op
    if on == e:  # C: 1-base overlap at acc's last base
        return Interval(o, l + ln - 1, c + cn[1:])
    gap = on - o - l  # D: gap after
    return Interval(o, l + gap + ln, c + "N" * gap + cn)


def fold_chain(reads: list[Interval], bit_compat: bool = False) -> Interval:
    acc = reads[0]
    for nxt in reads[1:]:
        acc = merge_step(acc, nxt, bit_compat)
    return acc

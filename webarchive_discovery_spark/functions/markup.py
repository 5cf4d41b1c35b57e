"""Adversarial-input guards for the HTML analyser kernels.

The reference runs every payload parser under a wall-clock thread timeout
(30 s per parser, ``HTMLAnalyser.java:121-127``; 300 s for Tika,
``reference.conf:132``) because a DOM parser's cost is not bounded by input
size.  A Python regex pass cannot be preempted mid-call (the sre engine
holds the GIL and checks no signals), so this engine enforces the same
contract — no record may stall an executor core — with a *predictive*
guard instead of a reactive one:

- :func:`markup_scan_guard` computes, in one linear occurrence-bounded
  pass, an upper bound on the work the analyser regexes can do on this
  input: the sum over every ``<`` of the distance to the next ``>`` (what
  every ``[^>]*``-style attribute scan is bounded by) plus, for each lazy
  block pair the kernels use (``<!-- -->``, ``<script></script>``,
  ``<style></style>``, ``<title></title>``, ``<head></head>``), the sum
  over openers of the distance to the next closer (what ``.*?``-to-closer
  scans cost when closers are missing).  Benign markup — including huge
  data-URI attributes — lands orders of magnitude under the budget; inputs
  engineered to make the lazy scans quadratic (many openers with missing
  closers) bust it in microseconds and surface as a ``parse_error`` row.
- :class:`Deadline` adds the reference's wall-clock bound as
  defense-in-depth, checked between regex passes and inside match loops
  (between passes is the best Python can do; the guard above ensures each
  individual pass is bounded).

Both raise; the Arrow kernels catch per record and emit an error row, so a
pathological payload costs one row, never a task.
"""

from __future__ import annotations

import time

__all__ = ["MarkupGuardError", "ParseTimeoutError", "Deadline", "markup_scan_guard",
           "PARSE_TIMEOUT_S"]

#: reference per-parser thread timeout (HTMLAnalyser.java:123)
PARSE_TIMEOUT_S = 30.0

#: lazy block pairs whose ``.*?``-to-closer scans the guard must bound
_PAIRS = (
    ("<!--", "-->"),
    ("<script", "</script"),
    ("<style", "</style"),
    ("<title", "</title"),
    ("<head", "</head"),
)


class MarkupGuardError(ValueError):
    """Input whose predicted regex scan cost exceeds the budget."""


class ParseTimeoutError(RuntimeError):
    """Per-record wall-clock parse deadline exceeded."""


class Deadline:
    __slots__ = ("t_end",)

    def __init__(self, seconds: float = PARSE_TIMEOUT_S):
        self.t_end = time.monotonic() + seconds

    def check(self) -> None:
        if time.monotonic() > self.t_end:
            raise ParseTimeoutError("parse deadline exceeded")


def markup_scan_guard(html: str, budget: int = 64_000_000, min_size: int = 4096) -> None:
    """Raise :class:`MarkupGuardError` when the predicted analyser-regex work
    on ``html`` exceeds ``budget`` character steps (see module docstring).
    Inputs under ``min_size`` cannot accumulate meaningful cost and are
    admitted without scanning.  Linear in the number of ``<`` occurrences,
    with early exit the moment the budget is busted."""
    n = len(html)
    if n < min_size:
        return
    lower = html.lower()
    find = lower.find
    cost = 0
    # generic tag spans: every '<' pays the distance to the next '>'
    i = find("<")
    gt = -1
    while i != -1:
        if gt != n and gt <= i:
            gt = find(">", i)
            if gt == -1:
                gt = n
        cost += gt - i
        if cost > budget:
            raise MarkupGuardError(
                f"markup scan cost > {budget} (tag spans); refusing pathological input"
            )
        i = find("<", i + 1)
    # block pairs: every opener pays the distance to the next closer
    for op, cl in _PAIRS:
        i = find(op)
        e = -1
        while i != -1:
            if e != n and e <= i:
                e = find(cl, i)
                if e == -1:
                    e = n
            cost += e - i
            if cost > budget:
                raise MarkupGuardError(
                    f"markup scan cost > {budget} ({op!r} blocks); refusing pathological input"
                )
            i = find(op, i + 1)

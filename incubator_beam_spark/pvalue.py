"""Side-input views (reference ``pvalue.py:475-633``).

Beam materializes a windowed view of a PCollection for use inside ParDo;
Spark's equivalents are broadcast values. These views resolve at
pipeline-construction time by collecting the (small) side collection on
the driver and shipping it with the task closure — the broadcast-join
path for large side inputs is ``F.broadcast`` at the DataFrame level
(SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Any


class _View:
    def __init__(self, pcoll):
        self.pcoll = pcoll

    def resolve(self) -> Any:
        raise NotImplementedError


class AsSingleton(_View):
    """reference ``pvalue.py:475`` — exactly-one-element view."""

    def resolve(self) -> Any:
        vals = self.pcoll.collect()
        if len(vals) != 1:
            raise ValueError(f"AsSingleton expects exactly 1 element, got {len(vals)}")
        return vals[0]


class AsList(_View):
    """reference ``pvalue.py:556``."""

    def resolve(self) -> list:
        return list(self.pcoll.collect())


class AsIter(AsList):
    """reference ``pvalue.py:524`` — same materialization as AsList here."""


class AsDict(_View):
    """reference ``pvalue.py:580`` — KV pairs to a dict."""

    def resolve(self) -> dict:
        return dict(self.pcoll.collect())


class AsMultiMap(_View):
    """reference ``pvalue.py:605`` — KV pairs to key -> [values]."""

    def resolve(self) -> dict:
        out: dict[Any, list] = {}
        for k, v in self.pcoll.collect():
            out.setdefault(k, []).append(v)
        return out

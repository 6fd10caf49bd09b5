"""Side-input views (reference ``pvalue.py:475-633``).

Beam materializes a windowed view of a PCollection for use inside ParDo;
Spark's equivalents are broadcast values. These views resolve at
pipeline-construction time by collecting the (small) side collection on
the driver and shipping it with the task closure — the broadcast-join
path for large side inputs is ``F.broadcast`` at the DataFrame level
(SURVEY.md §2.1).

Scale guard: side inputs are small BY CONTRACT (they broadcast to every
task), but an unguarded ``collect()`` of an accidentally-large
collection OOMs the driver before any error surfaces. Every view
therefore collects through a row cap (default
``DEFAULT_MAX_VIEW_ROWS``, overridable per view via ``max_rows=``) that
fails loudly BEFORE materializing the full result: the probe plan is
``limit(cap + 1)``, so at most cap+1 rows ever reach the driver. For a
genuinely large side relation, use a broadcast join
(``F.broadcast(df)``) instead of a driver-side view.
"""

from __future__ import annotations

from typing import Any

#: rows a side-input view may materialize on the driver before failing loudly
DEFAULT_MAX_VIEW_ROWS = 1_000_000


class SideInputSizeError(RuntimeError):
    """A side-input view exceeded its driver-side row cap."""


class _View:
    def __init__(self, pcoll, max_rows: int | None = None):
        self.pcoll = pcoll
        self.max_rows = DEFAULT_MAX_VIEW_ROWS if max_rows is None else int(max_rows)

    def _collect_capped(self) -> list:
        """Collect through ``limit(cap+1)`` — the driver never holds more
        than cap+1 rows even when the underlying collection is huge."""
        from .core import PCollection

        cap = self.max_rows
        probe = PCollection(self.pcoll.df.limit(cap + 1), self.pcoll.pipeline)
        probe._cogbk_names = getattr(self.pcoll, "_cogbk_names", None)
        vals = probe.collect()
        if len(vals) > cap:
            raise SideInputSizeError(
                f"{type(self).__name__} side input exceeds the driver-side cap "
                f"of {cap} rows; side inputs broadcast to every task and must "
                f"stay small — raise max_rows= explicitly if intended, or use "
                f"a broadcast join (F.broadcast) for large side relations"
            )
        return vals

    def resolve(self) -> Any:
        raise NotImplementedError


class AsSingleton(_View):
    """reference ``pvalue.py:475`` — exactly-one-element view."""

    def resolve(self) -> Any:
        # Route through PCollection.collect (via a limit(2) probe, like
        # _collect_capped) so EVERY schema translation lives in one place
        # — element/kv unwrapping AND the CoGroupByKey (key, {tag: list})
        # shape carried by _cogbk_names.
        from .core import PCollection

        probe = PCollection(self.pcoll.df.limit(2), self.pcoll.pipeline)
        probe._cogbk_names = getattr(self.pcoll, "_cogbk_names", None)
        vals = probe.collect()
        if len(vals) != 1:
            raise ValueError(f"AsSingleton expects exactly 1 element, got {len(vals)}")
        return vals[0]


class AsList(_View):
    """reference ``pvalue.py:556``."""

    def resolve(self) -> list:
        return list(self._collect_capped())


class AsIter(AsList):
    """reference ``pvalue.py:524`` — same materialization as AsList here."""


class AsDict(_View):
    """reference ``pvalue.py:580`` — KV pairs to a dict."""

    def resolve(self) -> dict:
        return dict(self._collect_capped())


class AsMultiMap(_View):
    """reference ``pvalue.py:605`` — KV pairs to key -> [values]."""

    def resolve(self) -> dict:
        out: dict[Any, list] = {}
        for k, v in self._collect_capped():
            out.setdefault(k, []).append(v)
        return out

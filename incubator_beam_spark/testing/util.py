"""assert_that / equal_to — the reference's PAssert-style harness
(reference ``sdks/python/apache_beam/testing/util.py:151,235``), adapted to
PCollections-as-DataFrames: matchers compare unordered multisets of
collected elements."""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable, Iterable
from typing import Any


def _key(e: Any) -> str:
    return repr(e)


def equal_to(expected: Iterable[Any]) -> Callable[[list], None]:
    expected = list(expected)

    def check(actual: list) -> None:
        ca, ce = Counter(map(_key, actual)), Counter(map(_key, expected))
        if ca != ce:
            missing = list((ce - ca).elements())[:5]
            extra = list((ca - ce).elements())[:5]
            raise AssertionError(
                f"PCollection mismatch: missing={missing} extra={extra} "
                f"(actual n={len(actual)}, expected n={len(expected)})"
            )

    return check


def is_empty() -> Callable[[list], None]:
    def check(actual: list) -> None:
        if actual:
            raise AssertionError(f"expected empty PCollection, got {actual[:5]}")

    return check


def assert_that(pcoll, matcher: Callable[[list], None]) -> None:
    """Collect the PCollection and apply the matcher (batch analog of the
    reference's sink-side assertion ParDo)."""
    matcher(pcoll.collect())

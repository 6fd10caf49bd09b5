"""Guards on the driver-contract registry itself.

The driver emits correctness rows for the FIRST 50 registered names
only, so the registry's priority window is load-bearing: these tests
pin the invariants a refactor could silently break."""

from __future__ import annotations

from incubator_beam_spark import registry


def test_priority_window_is_registry_prefix():
    qs = registry.load_all()
    names = list(qs)
    prio = [n for n in registry._PRIORITY if n in qs]
    assert names[: len(prio)] == prio, (
        "the priority window must be the exact prefix of registration order"
    )


def test_priority_names_all_exist():
    qs = registry.load_all()
    missing = [n for n in registry._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY references unknown gates: {missing}"


def test_window_gates_all_have_oracles():
    """Everything inside the 50-row driver window must be exact-oracle —
    a rows-only gate would waste a window slot on a weaker check."""
    qs = registry.load_all()
    window = list(qs)[:50]
    no_oracle = [n for n in window if qs[n].oracle is None]
    assert not no_oracle, f"rows-only gates inside the driver window: {no_oracle}"


def test_no_duplicate_registration():
    qs = registry.load_all()
    assert len(qs) == len(set(qs)), "duplicate gate names"


def test_every_oracle_is_nonempty_sql():
    qs = registry.load_all()
    bad = [n for n, q in qs.items() if q.oracle is not None and "SELECT" not in q.oracle.upper()]
    assert not bad, f"oracles without a SELECT: {bad}"


def test_banked_devices_manifest_green(spark, duck):
    """Every banked promotion device (queries/devices.py) runs against
    its manifest oracle — this is EXACTLY the (fn, oracle) pair the
    next round registers, so promotion cannot ship an unchecked pair.
    DTYPE-STRICT (verdict r9 item 2): the driver's value-hash is
    dtype-sensitive, and the value-only comparator let an
    int32-vs-int64 `mon` column through the entire r9 bank
    verification. Also asserts the manifest stays unregistered
    (growth freeze)."""
    from incubator_beam_spark import registry
    from incubator_beam_spark.queries.devices import devices

    from .conftest import SF_DIR, assert_matches_oracle_strict

    dev = devices()
    registered = set(registry.load_all())
    assert not (set(dev) & registered), "devices must stay unregistered"
    for name, (fn, oracle) in sorted(dev.items()):
        assert_matches_oracle_strict(fn(spark, SF_DIR), duck, oracle, name)


def test_promoted_r9_devices_registered_with_manifest_pairs():
    """The 19 r8-bank devices promoted in round 9 are registered with
    EXACTLY their banked (fn, oracle) pairs (window membership was an
    r9-window property; the window has since rotated)."""
    from incubator_beam_spark.queries.devices import promoted_r9

    qs = registry.load_all()
    promoted = promoted_r9()
    assert len(promoted) == 19
    for name, (fn, oracle) in promoted.items():
        assert name in qs, f"promoted device {name} not registered"
        assert qs[name].fn is fn, f"{name}: registered fn differs from manifest"
        assert qs[name].oracle == oracle, f"{name}: oracle differs from manifest"


def test_promoted_r10_devices_registered_with_manifest_pairs():
    """The 6 r9-bank devices promoted in round 10 are registered with
    EXACTLY their banked (fn, oracle) pairs (window membership was an
    r10-window property; the window has since rotated)."""
    from incubator_beam_spark.queries.devices import promoted_r10

    qs = registry.load_all()
    promoted = promoted_r10()
    assert len(promoted) == 6
    for name, (fn, oracle) in promoted.items():
        assert name in qs, f"promoted device {name} not registered"
        assert qs[name].fn is fn, f"{name}: registered fn differs from manifest"
        assert qs[name].oracle == oracle, f"{name}: oracle differs from manifest"


def test_promoted_r11_devices_registered_with_manifest_pairs():
    """The 7 r10-bank devices promoted in round 11 are registered with
    EXACTLY their banked (fn, oracle) pairs (window membership was an
    r11-window property; the window has since rotated — every one of
    the seven carries a green CORRECTNESS_r11 driver row)."""
    from incubator_beam_spark.queries.devices import promoted_r11

    qs = registry.load_all()
    promoted = promoted_r11()
    assert len(promoted) == 7
    for name, (fn, oracle) in promoted.items():
        assert name in qs, f"promoted device {name} not registered"
        assert qs[name].fn is fn, f"{name}: registered fn differs from manifest"
        assert qs[name].oracle == oracle, f"{name}: oracle differs from manifest"


def test_promoted_r12_devices_registered_with_manifest_pairs():
    """The 6 r11-bank devices promoted in round 12 are registered with
    EXACTLY their banked (fn, oracle) pairs, and all 6 LEAD the
    50-gate driver window (COVERAGE.md §window-plan, committed r12
    list)."""
    from incubator_beam_spark.queries.devices import promoted_r12

    qs = registry.load_all()
    window = list(qs)[:50]
    promoted = promoted_r12()
    assert len(promoted) == 6
    for name, (fn, oracle) in promoted.items():
        assert name in qs, f"promoted device {name} not registered"
        assert qs[name].fn is fn, f"{name}: registered fn differs from manifest"
        assert qs[name].oracle == oracle, f"{name}: oracle differs from manifest"
        assert name in window[:6], f"{name} promoted but not leading the window"

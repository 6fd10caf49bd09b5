"""Run the reference's full trigger conformance corpus
(``testing/data/trigger_transcripts.yaml``) through the trigger VM via
:mod:`incubator_beam_spark.streaming.transcripts` — every transcript in
the file, parameterized, replacing spot-sampling with the complete
(window_fn x trigger x accumulation x combiner x lateness) matrix.

The corpus is public Apache-2.0 test DATA, read from the reference
checkout at collection time (override with TRIGGER_TRANSCRIPTS_YAML);
the whole module skips when no corpus file is present so the repo stays
standalone.
"""

from __future__ import annotations

import os

import pytest

yaml = pytest.importorskip("yaml")

from incubator_beam_spark.streaming.transcripts import run_transcript

CORPUS = os.environ.get(
    "TRIGGER_TRANSCRIPTS_YAML",
    "/root/reference/sdks/python/apache_beam/testing/data/"
    "trigger_transcripts.yaml",
)


def _load_specs():
    if not os.path.exists(CORPUS):
        return []
    with open(CORPUS) as f:
        return [s for s in yaml.safe_load_all(f) if s]


_SPECS = _load_specs()

if not _SPECS:
    pytest.skip(
        f"trigger transcript corpus not found at {CORPUS}",
        allow_module_level=True,
    )


@pytest.mark.parametrize(
    "spec", _SPECS, ids=[s.get("name", "unnamed") for s in _SPECS]
)
def test_transcript(spec):
    if "error" in spec:
        # corpus self-tests: these transcripts are intentionally wrong and
        # the harness must reject them with the documented message
        with pytest.raises(Exception, match=spec["error"]):
            run_transcript(spec)
    else:
        run_transcript(spec)


def _specs_by_name():
    return {s["name"]: s for s in _SPECS if "name" in s}


@pytest.mark.parametrize(
    "name,mutate",
    [
        ("early_late_sessions",
         lambda s: _first_expect(s)[0].__setitem__("values", [1, 3])),
        ("known_late_data_watermark",
         lambda s: _first_expect(s)[0].__setitem__("timestamp", 8)),
        ("discarding_early_fixed",
         lambda s: _first_expect(s)[0].__setitem__("index", 5)),
        ("early_late_sessions",
         lambda s: _first_expect(s)[0].__setitem__("early", False)),
        ("early_late_sessions",
         lambda s: _last_expect(s)[0].__setitem__("nonspeculative_index", 7)),
    ],
)
def test_transcript_harness_discriminates(name, mutate):
    """Anti-vacuity: corrupting any single expected attribute must fail
    the transcript — proves the partial matcher actually compares
    values/timestamps/indexes/flags rather than vacuously passing."""
    import copy

    spec = copy.deepcopy(_specs_by_name()[name])
    mutate(spec)
    with pytest.raises(AssertionError, match="Unmatched output"):
        run_transcript(spec)


def _first_expect(spec):
    return next(t["expect"] for t in spec["transcript"] if "expect" in t)


def _last_expect(spec):
    return [t["expect"] for t in spec["transcript"] if "expect" in t][-1]


def test_transcript_harness_catches_unexpected_output():
    import copy

    spec = copy.deepcopy(_specs_by_name()["fixed_default"])
    spec["transcript"] = [
        t for t in spec["transcript"] if "expect" not in t
    ] + [{"watermark": 300}]
    with pytest.raises(AssertionError, match="Unexpected output"):
        run_transcript(spec)

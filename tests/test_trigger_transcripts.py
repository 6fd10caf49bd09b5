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

"""bench.py's straggler table is a GENERATED artifact
(scripts/update_steady.py -> bench_steady.json). These tests enforce
the two drift modes the generation exists to prevent: a new headline
query silently missing straggler protection, and a stale/garbage
entry. No Spark session needed."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _steady():
    with open(os.path.join(REPO, "bench_steady.json")) as f:
        return json.load(f)


class TestBenchSteadyArtifact:
    def test_every_headline_query_has_a_steady_entry(self):
        steady = _steady()
        missing = [
            q for q in ["gen_10m_rows", *bench.HEADLINE] if q not in steady
        ]
        assert not missing, (
            f"headline queries without a steady entry fall back to the "
            f"weaker spread-only straggler check: {missing} — run "
            f"bench.py solo and feed its output to "
            f"scripts/update_steady.py"
        )

    def test_entries_are_sane_positive_seconds(self):
        steady = _steady()
        assert steady, "bench_steady.json is empty"
        for q, v in steady.items():
            assert isinstance(v, (int, float)) and 0 < v < 600, (q, v)

    def test_loader_tolerates_missing_artifact(self, tmp_path, monkeypatch):
        # bench must still run (spread-only mode) if the artifact is gone
        monkeypatch.setattr(
            bench, "_STEADY_PATH", str(tmp_path / "nope.json")
        )
        assert bench._load_steady() == {}

    def test_update_steady_parses_driver_wrapper(self, tmp_path):
        # the driver wraps the bench one-liner inside a "tail" field;
        # regeneration must find it there and take per-query minima
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "update_steady",
            os.path.join(REPO, "scripts", "update_steady.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        line = json.dumps(
            {
                "metric": "headline_total",
                "value": 1.0,
                "unit": "sec",
                "queries": {"q_demo": 0.5},
                "sf": 0.1,
            }
        )
        wrapper = tmp_path / "BENCH_rX.json"
        wrapper.write_text(json.dumps({"n": 1, "tail": f"noise\r{line}\n"}))
        found = list(mod._bench_lines(str(wrapper)))
        assert found and found[0]["queries"] == {"q_demo": 0.5}
        # raw bench output parses too
        raw = tmp_path / "solo.json"
        raw.write_text(line)
        found = list(mod._bench_lines(str(raw)))
        assert found and found[0]["sf"] == 0.1

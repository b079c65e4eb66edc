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
    def test_every_headline_query_has_a_steady_entry_in_both_lanes(self):
        steady = _steady()
        assert set(steady) >= {"sf0.1", "sf1"}, (
            "bench_steady.json must carry BOTH bench lanes "
            "(regenerate with scripts/update_steady.py)"
        )
        for lane in ("sf0.1", "sf1"):
            missing = [
                q for q in ["gen_10m_rows", *bench.HEADLINE]
                if q not in steady[lane]
            ]
            assert not missing, (
                f"{lane} lane: headline queries without a steady entry "
                f"fall back to the weaker spread-only straggler check: "
                f"{missing} — run bench.py solo at that SF and feed its "
                f"output to scripts/update_steady.py"
            )

    def test_entries_are_sane_positive_seconds(self):
        steady = _steady()
        assert steady, "bench_steady.json is empty"
        for lane, table in steady.items():
            assert table, f"{lane} lane is empty"
            for q, v in table.items():
                assert isinstance(v, (int, float)) and 0 < v < 600, (
                    lane, q, v,
                )

    def test_sf1_lane_slower_than_sf01_on_data_queries(self):
        # 10x the data should never be FASTER: a sf1 minimum below the
        # sf0.1 minimum means a run was recorded under the wrong lane
        steady = _steady()
        for q, v1 in steady.get("sf1", {}).items():
            v01 = steady["sf0.1"].get(q)
            if v01 is None or q.startswith("gen"):
                continue  # generation queries are SF-independent
            assert v1 >= 0.5 * v01, (q, v01, v1)

    def test_loader_tolerates_missing_artifact(self, tmp_path, monkeypatch):
        # bench must still run (spread-only mode) if the artifact is gone
        monkeypatch.setattr(
            bench, "_STEADY_PATH", str(tmp_path / "nope.json")
        )
        assert bench._load_steady() == {}
        assert bench._load_steady(1) == {}

    def test_loader_reads_lanes_and_legacy(self, tmp_path, monkeypatch):
        two = tmp_path / "two.json"
        two.write_text(json.dumps(
            {"sf0.1": {"qa": 1.0}, "sf1": {"qa": 5.0}}
        ))
        monkeypatch.setattr(bench, "_STEADY_PATH", str(two))
        assert bench._load_steady(0.1) == {"qa": 1.0}
        assert bench._load_steady(1) == {"qa": 5.0}
        legacy = tmp_path / "legacy.json"
        legacy.write_text(json.dumps({"qa": 2.0}))
        monkeypatch.setattr(bench, "_STEADY_PATH", str(legacy))
        assert bench._load_steady(0.1) == {"qa": 2.0}
        assert bench._load_steady(1) == {}

    def test_sf_of_directory_convention(self):
        assert bench._sf_of("/root/testdata/sf0.1") == 0.1
        assert bench._sf_of("/root/testdata/sf0.01") == 0.01
        assert bench._sf_of("/tmp/sf1-scale") == 1
        assert bench._sf_of("/somewhere/else") == 0.1

    def test_sf_of_requires_delimiter_bounded_tag(self):
        # a bare substring match would route these into the sf1 lane
        # and compare timings against the wrong minima
        assert bench._sf_of("/data/sf10") == 0.1        # not sf1
        assert bench._sf_of("/tmp/mysf1-old") == 0.1    # not sf1
        assert bench._sf_of("/x/sf1/") == 1             # trailing slash ok
        assert bench._sf_of("run_sf1") == 1
        assert bench._sf_of("/a/sf0.1-copy") == 0.1
        assert bench._sf_of("/a/xsf0.1") == 0.1         # no boundary

    def test_sf_of_dot_is_a_delimiter(self):
        # dot-separated names must route to the RIGHT lane, not fall
        # back to sf0.1 and get compared against the tighter minima
        assert bench._sf_of("/root/testdata.sf1") == 1
        assert bench._sf_of("/data/v2.sf1") == 1
        assert bench._sf_of("/data/sf1.old") == 1
        assert bench._sf_of("/a/run.sf0.01.bak") == 0.01
        assert bench._sf_of("/data/v2.sf10") == 0.1     # still not sf1

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

"""The multi-size bench sweep's export artifacts (twin of the
reference's benches/run_multiple_benchmarks.py + visualize_results.py):
per-size JSON/CSV in the reference's schema and the scalability chart.
The timings themselves are exercised by the driver's bench run; here we
pin the artifact shapes with synthetic results (no Spark session)."""

from __future__ import annotations

import json
import os

from bench import _svg_scalability_chart, _write_results_files

FAKE = {
    100: [
        {"name": "Full Table Scan", "elapsed_ms": 1.0, "rows_processed": 100,
         "bytes_processed": 1000, "throughput_mbps": 1.0, "rows_per_sec": 100000.0},
        {"name": "GROUP BY region", "elapsed_ms": 2.0, "rows_processed": 100,
         "bytes_processed": 1000, "throughput_mbps": 0.5, "rows_per_sec": 50000.0},
    ],
    200: [
        {"name": "Full Table Scan", "elapsed_ms": 1.5, "rows_processed": 200,
         "bytes_processed": 2000, "throughput_mbps": 1.3, "rows_per_sec": 133000.0},
        {"name": "GROUP BY region", "elapsed_ms": 2.5, "rows_processed": 200,
         "bytes_processed": 2000, "throughput_mbps": 0.8, "rows_per_sec": 80000.0},
    ],
}


def test_results_files_match_reference_schema(tmp_path):
    _write_results_files(FAKE[100], str(tmp_path), "100")
    with open(tmp_path / "benchmark_results_100.json") as fh:
        data = json.load(fh)
    # reference exportJSON shape (benchmark.cpp:250-276)
    assert set(data) == {"benchmarks"}
    assert set(data["benchmarks"][0]) == {
        "name", "elapsed_ms", "rows_processed", "bytes_processed",
        "throughput_mbps", "rows_per_sec",
    }
    with open(tmp_path / "benchmark_results_100.csv") as fh:
        header = fh.readline().strip()
    # reference exportCSV header (benchmark.cpp:233-248)
    assert header == (
        "benchmark,elapsed_ms,rows_processed,bytes_processed,"
        "throughput_mbps,rows_per_sec"
    )
    assert len(open(tmp_path / "benchmark_results_100.csv").readlines()) == 3


def test_svg_chart_is_wellformed(tmp_path):
    import xml.etree.ElementTree as ET

    path = str(tmp_path / "scalability.svg")
    _svg_scalability_chart(FAKE, path)
    root = ET.parse(path).getroot()
    assert root.tag.endswith("svg")
    body = open(path).read()
    assert "polyline" in body and "Full Table Scan" in body
    assert os.path.getsize(path) > 500

"""Perf-artifact consistency: the measured table in PERF_NOTES.md must be a
pure render of the committed bench_details.json (round-1 review found the
two disagreeing because tables were hand-edited at different times)."""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_bench_details_is_committed_and_tpu():
    details = json.loads((REPO / "bench_details.json").read_text())
    assert details.get("backend") == "tpu", (
        "bench_details.json must record a TPU run (CPU CI runs write only "
        "their --output file)"
    )
    # The workloads the docs quote must all be present.
    for key in [
        "env_step_4096x10k_ms",
        "env_dkd_4096x10k_ms",
        "parameter_beam_4096_env_step_ms",
        "track_100k_screen_histogram_ms",
        "track_100k_screen_cloud_in_cell_ms",
        "track_100k_screen_kde_binning8_ms",
        "space_charge_100k_pallas_ms",
        "space_charge_grad_100k_pallas_ms",
        "space_charge_100k_xla_ms",
        "space_charge_grad_100k_xla_ms",
        "ares_full_lattice_100k_ms",
        "transports_per_s",
    ]:
        assert key in details, f"missing workload {key}"
    # Obvious-bogosity guards (failure modes seen in earlier rounds): a
    # "measurement" at the 1e-9 slope clamp, or wildly off scale.
    for key, value in details.items():
        if key.endswith("_ms"):
            assert 1e-4 < value < 1e5, f"{key} = {value} looks bogus"


def test_perf_notes_table_matches_bench_details():
    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "update_perf_notes.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert result.returncode == 0, result.stderr

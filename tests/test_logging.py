"""CsvLogger file behavior: O(1) appends, header evolution on new keys."""
import csv

from gif_synthesis_with_discrete_diffusion_tpu.utils.logging import CsvLogger


def _read(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_csv_logger_appends_rows(tmp_path):
    lg = CsvLogger(tmp_path)
    lg.log_metrics({"loss": 1.0}, step=0)
    size_after_first = lg.path.stat().st_size
    lg.log_metrics({"loss": 0.5}, step=1)
    lg.log_metrics({"loss": 0.25}, step=2)
    rows = _read(lg.path)
    assert [r["step"] for r in rows] == ["0", "1", "2"]
    assert [float(r["loss"]) for r in rows] == [1.0, 0.5, 0.25]
    # append-only: later logs grow the file past the first write
    assert lg.path.stat().st_size > size_after_first


def test_csv_logger_header_grows_with_new_keys(tmp_path):
    lg = CsvLogger(tmp_path)
    lg.log_metrics({"loss": 1.0}, step=0)
    lg.log_metrics({"loss": 0.5, "fvd": 123.0}, step=1)  # new key -> rewrite
    lg.log_metrics({"loss": 0.4, "fvd": 100.0}, step=2)  # back to append
    rows = _read(lg.path)
    assert len(rows) == 3
    assert rows[0]["fvd"] == ""          # old row padded under new header
    assert float(rows[2]["fvd"]) == 100.0

"""bench.py's driver-facing contract: the one-JSON-line emit format, the
partial-result harvesting that makes a timed-out child salvageable, and the
derived host-feed figure. Pure-function tests — no TPU, no subprocesses."""

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _emit_capture(out):
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit(dict(out))
    return json.loads(buf.getvalue())


def test_emit_ok_and_missing_status():
    line = _emit_capture({"eval_imgs_per_sec": 8400.0, "train_step_ms": 309.0})
    assert line["value"] == 8400.0 and line["status"] == "ok"
    assert line["vs_baseline"] == 4.2
    assert line["extra"]["train_step_ms"] == 309.0
    assert "eval_imgs_per_sec" not in line["extra"]  # promoted to value

    line = _emit_capture({})
    assert line["value"] == 0.0 and line["status"] == "missing"


def test_emit_derives_host_cores_to_feed_chip():
    line = _emit_capture(
        {"eval_imgs_per_sec": 8000.0, "decode_cpu_ms_per_img": 2.0}
    )
    assert line["extra"]["host_cores_to_feed_chip"] == 16.0
    # not derived without the headline (no fabricated numbers)
    line = _emit_capture({"decode_cpu_ms_per_img": 2.0})
    assert "host_cores_to_feed_chip" not in line["extra"]


def test_parse_partials_takes_last_cumulative_line():
    stdout = "\n".join([
        "# device eval: 8400.0 imgs/s",
        '#partial {"eval_imgs_per_sec": 8400.0}',
        "garbage line",
        "#partial not-json",  # malformed partials are skipped, not fatal
        '#partial {"eval_imgs_per_sec": 8400.0, "train_imgs_per_sec": 828.0}',
    ])
    assert bench._parse_partials(stdout) == {
        "eval_imgs_per_sec": 8400.0, "train_imgs_per_sec": 828.0
    }
    assert bench._parse_partials("no partials here") is None

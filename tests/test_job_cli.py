"""job.py mode/flag cross-guards: every flag a mode would silently ignore
refuses at parse time (before the Spark session builds) — the CLI twin of
configfile.py's accepted-but-ignored CONFIG_FAILs."""

import pytest

import job


def _fails(argv):
    with pytest.raises(SystemExit) as ei:
        job.main(argv)
    assert ei.value.code == 2  # argparse error exit


def test_replay_refuses_stream_only_flags():
    for flag, val in (("--history-dir", "/tmp/h"),
                      ("--change-stream-dir", "/tmp/cs"),
                      ("--expire-every", "2"),
                      ("--feed-dir", "/tmp/f"),
                      ("--checkpoint", "/tmp/c"),
                      ("--state-dir", "/tmp/s"),
                      ("--compact-every", "4"),
                      ("--change-stream-format", "protobuf")):
        _fails(["replay", "/tmp/t", flag, val])


def test_stream_refuses_replay_only_flags():
    base = ["stream", "/tmp/t", "--feed-dir", "/tmp/f",
            "--checkpoint", "/tmp/c", "--state-dir", "/tmp/s"]
    _fails(base + ["--n-txs", "500"])
    _fails(base + ["--with-ddl"])
    _fails(base + ["--batch-id", "3"])
    _fails(base + ["--batch-id", "0"])  # explicit 0 refused too
    _fails(base + ["--expire-keep", "2"])  # needs --expire-every here


def test_config_refuses_engine_flags():
    for extra in (["--start-scn", "5"], ["--history-dir", "/tmp/h"],
                  ["--merge-mode", "mor"], ["--n-txs", "10"],
                  ["--change-stream-format", "protobuf"],
                  ["--expire-every", "2"], ["--state-dir", "/tmp/s"]):
        _fails(["config", "/tmp/engine.json"] + extra)

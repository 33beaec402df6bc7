"""Pure-python tests for tools/bench_control.py's compare logic (no
Spark): artifact unwrapping (driver-wrapped vs raw payloads), the
common-query cold-total ratio, and the three compare exit codes —
0 parity / 1 moved / 2 no-comparable-data."""

from __future__ import annotations

import json
import sys
from argparse import Namespace

import pytest

sys.path.insert(0, "/root/repo")
from tools import bench_control as bc  # noqa: E402


def test_payload_unwraps_driver_artifacts():
    raw = {"queries": {"a": 1.0}}
    wrapped = {"n": 5, "rc": 0, "parsed": raw, "tail": "..."}
    unparsed = {"n": 5, "rc": 0, "parsed": None, "tail": "..."}
    assert bc._payload(raw) is raw
    assert bc._payload(wrapped) is raw
    assert bc._payload(unparsed) is unparsed  # parsed:null -> no data


def test_cold_filters_non_numeric():
    art = {"queries": {"a": 1.5, "b": "ERR", "c": 2}}
    assert bc._cold(art) == {"a": 1.5, "c": 2}


def test_common_ratio_uses_only_shared_queries():
    prev = {"queries": {"a": 1.0, "b": 2.0, "gone": 9.0}}
    cur = {"queries": {"a": 2.0, "b": 4.0, "new": 9.0}}
    ta, tb, ratio, common = bc._common_ratio(prev, cur)
    assert (ta, tb, common) == (3.0, 6.0, ["a", "b"])
    assert ratio == 2.0


def _write(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def _ns(prev, cur, threshold=1.3):
    return Namespace(prev=prev, cur=cur, threshold=threshold)


def test_compare_exit_codes(tmp_path, capsys):
    parity = _write(tmp_path, "a.json", {"queries": {"q": 1.0, "r": 2.0}})
    same = _write(tmp_path, "b.json", {"queries": {"q": 1.1, "r": 2.0}})
    moved = _write(tmp_path, "c.json", {"queries": {"q": 2.0, "r": 4.0}})
    nodata = _write(tmp_path, "d.json", {"parsed": None, "tail": "..."})

    assert bc.cmd_compare(_ns(parity, same)) == 0
    assert bc.cmd_compare(_ns(parity, moved)) == 1
    # a big move DOWN is also a trigger (either direction)
    assert bc.cmd_compare(_ns(moved, parity)) == 1
    assert bc.cmd_compare(_ns(parity, nodata)) == 2
    err = capsys.readouterr().err
    assert "no common per-query data" in err

#!/usr/bin/env python3
"""Derive the registry counts from a `graft.Verify` output directory —
the gate expectation ("N pass / 0 fail") is N = len(oracle_sql.json),
never a hardcoded number (round-5 advice: hardcoded counts go stale).

Usage: python3 scripts/count_registry.py /tmp/vout
"""
import json
import pathlib
import sys

out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout")
oracles = json.loads((out / "oracle_sql.json").read_text())
registered = sum(1 for p in out.iterdir() if p.is_dir())
print(f"{len(oracles)} oracle-backed of {registered} registered "
      f"({registered - len(oracles)} rows-only)")
print(f"gate expectation: {len(oracles)} pass / 0 fail")

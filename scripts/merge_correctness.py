#!/usr/bin/env python3
"""Merge a partial re-check/batch result into a scale-sweep artifact.

Usage: merge_correctness.py <artifact.json> <batch.json>

The scale artifacts (CORRECTNESS_SF1/SF10/SF100.json) are built in
batches: the initial sweep plus per-batch Verify+check runs (fix
re-checks, new registry entries, envelope-extension batches). Each batch
check.py --json file is merged here — batch entries override the
artifact's (a re-check after a fix replaces the recorded failure), new
names extend it. Prints the artifact's resulting ok/bad tally so the
"N/N" claim is recomputed, never hand-edited.
"""
import json
import sys


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    dst_path, src_path = sys.argv[1], sys.argv[2]
    try:
        dst = json.load(open(dst_path))
    except FileNotFoundError:
        dst = {}
    src = json.load(open(src_path))
    replaced = sorted(set(dst) & set(src))
    added = sorted(set(src) - set(dst))
    dst.update(src)
    with open(dst_path, "w") as f:
        json.dump(dst, f, indent=2, sort_keys=True)
    ok = sum(1 for v in dst.values() if v.get("hash_match"))
    bad = sorted(k for k, v in dst.items() if not v.get("hash_match"))
    print(f"{dst_path}: {ok}/{len(dst)} hash-matched "
          f"(+{len(added)} added, {len(replaced)} replaced)")
    if bad:
        print(f"NOT matched: {bad}")
        sys.exit(1)


if __name__ == "__main__":
    main()

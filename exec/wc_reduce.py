#!/usr/bin/env python3
"""Word-count reducer executable (engine-native example operator).

Contract: stdin is ``key\\tvalue`` lines sorted by line, all lines of
a key adjacent (the engine's sorted-group guarantee); emit one
``key\\ttotal`` per key. Streams in O(1) memory — never materializes
a group.
"""
import sys


def main() -> None:
    cur = None
    total = 0
    for line in sys.stdin:
        line = line.rstrip("\n")
        if not line:
            continue
        key, _, val = line.partition("\t")
        if key != cur:
            if cur is not None:
                sys.stdout.write(f"{cur}\t{total}\n")
            cur, total = key, 0
        total += int(val)
    if cur is not None:
        sys.stdout.write(f"{cur}\t{total}\n")


if __name__ == "__main__":
    main()

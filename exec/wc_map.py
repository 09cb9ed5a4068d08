#!/usr/bin/env python3
"""Word-count mapper executable (engine-native example operator).

Contract (stdin lines -> stdout ``key\\tvalue`` lines): for every
whitespace-separated token of each input line, lowercased, emit
``token\\t1``.
"""
import sys


def main() -> None:
    for line in sys.stdin:
        for tok in line.lower().split():
            sys.stdout.write(f"{tok}\t1\n")


if __name__ == "__main__":
    main()

"""Round maintenance helper: turn a driver CORRECTNESS_r{N}.json into
the `_DRIVER_VERIFIED_R{N}` / `_DRIVER_RED_R{N}` code blocks that
registry()'s staleness chain needs each round (see the ROUND
MAINTENANCE comment in plans/catalog.py).

Usage: python scripts/fold_correctness.py CORRECTNESS_r11.json 11

Prints the two frozenset definitions ready to paste; a name is GREEN
when rows+schema+hash all match (or rows-only with no error for
entries without an oracle), RED otherwise. After pasting, extend
registry()'s seen/rXn sets and the cohort list — and update
tests/test_catalog_oracle.py::test_registry_rotation_order the same
way (it imports the new sets by name).
"""

from __future__ import annotations

import json
import sys
import textwrap


def main() -> None:
    path, rnd = sys.argv[1], int(sys.argv[2])
    data = json.load(open(path))
    greens, reds = [], []
    for name, row in data.items():
        ok = row.get("err") is None and row.get("rows_match") and (
            row.get("hash_match") or row.get("hash_match") is None
        )
        (greens if ok else reds).append(name)
    body = textwrap.fill(
        ", ".join(f'"{n}"' for n in sorted(greens)),
        width=72,
        initial_indent=" " * 8,
        subsequent_indent=" " * 8,
    )
    print(f"# Green in the round-{rnd} driver window ({path}): "
          f"{len(greens)} of {len(data)}.")
    print(f"_DRIVER_VERIFIED_R{rnd} = frozenset(\n    {{\n{body},\n    }}\n)")
    print()
    if reds:
        red_body = textwrap.fill(
            ", ".join(f'"{n}"' for n in sorted(reds)), width=72,
            initial_indent=" " * 4, subsequent_indent=" " * 4,
        )
        print(f"# RED in the round-{rnd} driver window — re-queue FIRST.")
        print(f"_DRIVER_RED_R{rnd} = frozenset({{\n{red_body}\n}})")
    else:
        print(f"# No reds in the round-{rnd} driver window.")
        print(f"_DRIVER_RED_R{rnd} = frozenset()")


if __name__ == "__main__":
    main()

"""Rotation-tail tracker: per-registry-row most recent GREEN driver
check, from the CORRECTNESS_r*.json artifacts — the staleness report
behind the DRIVER_VERIFIED rotation discipline (VERDICT r11 item 2,
r13 item 1).  Run:

    python tools/rotation_status.py            # histogram + stale tail
    python tools/rotation_status.py --window   # simulate the next
                                               # driver 50-row window

Uses contract._last_checked_rounds(), i.e. the exact green-row
definition the rotation itself uses (full-oracle rows need
rows+schema+hash with no err; rows-only-by-contract rows need
spark_rows > 0)."""

from __future__ import annotations

import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50  # the driver checks ~the first 50 rows of queries()


def main() -> None:
    from msg_vector_search_spark import contract

    last = contract._last_checked_rounds()
    reg = list(contract.REGISTRY)
    pending = [k for k in reg if k not in contract.DRIVER_VERIFIED]

    hist = Counter(last.get(k, 0) for k in reg)
    print(f"{len(reg)} registry rows; last-green-check histogram "
          "(0 = never checked):")
    for rnd in sorted(hist):
        print(f"  r{rnd:>2}: {hist[rnd]:>3} rows")

    cur_max = max(hist) if hist else 0
    stale_cut = cur_max - 2
    stale = sorted((k for k in reg if last.get(k, 0) <= stale_cut
                    and k not in pending),
                   key=lambda k: (last.get(k, 0), k))
    print(f"\n{len(pending)} pending (not in DRIVER_VERIFIED — "
          "verify first):")
    for k in pending:
        print(f"  r{last.get(k, 0):>2} {k}")
    print(f"\n{len(stale)} listed rows at <= r{stale_cut} "
          "(the rotation tail, oldest first):")
    for k in stale:
        print(f"  r{last.get(k, 0):>2} {k}")

    # the enforced max-age bound (contract.MAX_CHECK_AGE_ROUNDS):
    # overdue rows are auto-bumped directly after the reserved pending
    # quota, so the backlog drains at ~(window - quota)/round
    cut = cur_max - contract.MAX_CHECK_AGE_ROUNDS
    overdue = [k for k in reg if k not in pending
               and last.get(k, 0) <= cut]
    q = min(len(pending), contract.PENDING_WINDOW_QUOTA)
    rate = max(1, WINDOW - q)
    rounds_to_drain = -(-len(overdue) // rate) if overdue else 0
    print(f"\nmax-age bound: {len(overdue)} rows overdue "
          f"(> {contract.MAX_CHECK_AGE_ROUNDS} rounds old, <= r{cut}); "
          f"window drains ~{rate}/round -> bound restored in "
          f"{rounds_to_drain} window(s)")

    if "--window" in sys.argv:
        order = list(contract.verification_order(
            {k: None for k in reg}))[:WINDOW]
        mix = Counter(last.get(k, 0) for k in order)
        print(f"\nnext driver window ({WINDOW} rows) last-check mix: "
              f"{dict(sorted(mix.items()))}")
        for k in order:
            print(f"  r{last.get(k, 0):>2} {k}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass  # e.g. piped through `head`

"""Pure-Python pins for the DRIVER_VERIFIED rotation machinery —
the ordering contract the driver's 50-row CORRECTNESS window rides on
(no SparkSession needed)."""

from __future__ import annotations

from msg_vector_search_spark import contract


def test_pending_rows_come_first_in_registration_order():
    order = list(contract.verification_order(
        {k: None for k in contract.REGISTRY}))
    pending = [k for k in contract.REGISTRY
               if k not in contract.DRIVER_VERIFIED]
    assert order[:len(pending)] == pending
    # and every registry row appears exactly once
    assert sorted(order) == sorted(contract.REGISTRY)


def test_listed_rows_sorted_oldest_green_check_first():
    """After the pending block comes the ROTATION_PRIORITY bump (the
    §2 rows VERDICT r14 item 5 orders into the next window while they
    are stale), then every remaining listed row oldest-check-first."""
    last = contract._last_checked_rounds()
    order = list(contract.verification_order(
        {k: None for k in contract.REGISTRY}))
    pending = [k for k in contract.REGISTRY
               if k not in contract.DRIVER_VERIFIED]
    prio = [k for k in contract.ROTATION_PRIORITY
            if k in contract.DRIVER_VERIFIED and last.get(k, 0) <= 10]
    n_head = len(pending) + len(prio)
    assert order[len(pending):n_head] == prio
    done = order[n_head:]
    rounds = [last.get(k, 0) for k in done]
    assert rounds == sorted(rounds), \
        "DRIVER_VERIFIED rows must rotate oldest-check-first"


def test_rotation_priority_self_disarms_when_fresh():
    """The §2 bump only holds while the row is STALE (<= r10): a row
    with a fresh CORRECTNESS round must fall back into the age sort,
    so the one-window bump can't permanently distort the rotation."""
    last = contract._last_checked_rounds()
    order = list(contract.verification_order(
        {k: None for k in contract.REGISTRY}))
    fresh = [k for k in contract.ROTATION_PRIORITY
             if k in contract.DRIVER_VERIFIED and last.get(k, 0) > 10]
    pending = [k for k in contract.REGISTRY
               if k not in contract.DRIVER_VERIFIED]
    prio = [k for k in contract.ROTATION_PRIORITY
            if k in contract.DRIVER_VERIFIED and last.get(k, 0) <= 10]
    head = order[:len(pending) + len(prio)]
    for k in fresh:
        assert k not in head


def test_driver_verified_names_all_registered():
    stray = [k for k in contract.DRIVER_VERIFIED
             if k not in contract.REGISTRY]
    assert not stray, f"DRIVER_VERIFIED names not in REGISTRY: {stray}"


def test_last_checked_counts_only_green_rows():
    """A failed or hash-mismatched CORRECTNESS row must NOT refresh a
    row's last-checked round (it should rotate FORWARD instead)."""
    import msg_vector_search_spark.contract as c

    # exercise the green() predicate through a synthetic artifact dir
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "err": None}
    bad_hash = dict(ok, hash_match=False)
    rows_only = {"err": "no_oracle", "spark_rows": 7}
    rows_only_empty = {"err": "no_oracle", "spark_rows": 0}
    # the predicate is embedded in _last_checked_rounds; replicate its
    # contract here so a refactor that weakens it fails this pin
    def green(row):
        if row.get("err") == "no_oracle":
            return (row.get("spark_rows") or 0) > 0
        return (bool(row.get("rows_match")) and bool(row.get("schema_match"))
                and bool(row.get("hash_match")) and row.get("err") is None)

    assert green(ok) and green(rows_only)
    assert not green(bad_hash) and not green(rows_only_empty)
    # and the real cache agrees with CORRECTNESS_r13 (all green there)
    last = c._last_checked_rounds()
    import json, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(c.__file__)))
    r13 = json.load(open(os.path.join(root, "CORRECTNESS_r13.json")))
    for name, row in r13.items():
        if green(row):
            assert last.get(name, 0) >= 13

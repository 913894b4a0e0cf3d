"""Pure-Python pins for the DRIVER_VERIFIED rotation machinery —
the ordering contract the driver's 50-row CORRECTNESS window rides on
(no SparkSession needed)."""

from __future__ import annotations

from msg_vector_search_spark import contract


def _blocks():
    """Recompute the (pending_head, overdue, pending_tail, done) blocks
    exactly as verification_order defines them."""
    last = contract._last_checked_rounds()
    cur = max(last.values(), default=0)
    cut = cur - contract.MAX_CHECK_AGE_ROUNDS
    reg_pos = {k: i for i, k in enumerate(contract.REGISTRY)}
    overdue = sorted((k for k in contract.REGISTRY
                      if k in contract.DRIVER_VERIFIED
                      and last.get(k, 0) <= cut),
                     key=lambda k: (last.get(k, 0), reg_pos[k]))
    pending = sorted((k for k in contract.REGISTRY
                      if k not in contract.DRIVER_VERIFIED),
                     key=lambda k: (last.get(k, 0), reg_pos[k]))
    q = contract.PENDING_WINDOW_QUOTA
    return pending[:q], overdue, pending[q:], last


def test_pending_quota_comes_first_never_checked_leading():
    order = list(contract.verification_order(
        {k: None for k in contract.REGISTRY}))
    head, _, _, last = _blocks()
    assert order[:len(head)] == head
    # never-checked rows outrank changed-but-recently-green ones
    ages = [last.get(k, 0) for k in head]
    assert ages == sorted(ages)
    # and every registry row appears exactly once
    assert sorted(order) == sorted(contract.REGISTRY)


def test_overdue_rows_outrank_the_tail_oldest_first():
    """The max-age bound (VERDICT r15 item 3): every row older than
    MAX_CHECK_AGE_ROUNDS vs the newest artifact sits directly after
    the reserved pending quota, oldest first — so the staleness
    backlog drains at nearly the full window rate no matter how many
    new rows a round adds."""
    head, overdue, ptail, last = _blocks()
    order = list(contract.verification_order(
        {k: None for k in contract.REGISTRY}))
    assert order[len(head):len(head) + len(overdue)] == overdue
    rounds = [last.get(k, 0) for k in overdue]
    assert rounds == sorted(rounds)
    done = order[len(head) + len(overdue) + len(ptail):]
    drounds = [last.get(k, 0) for k in done]
    assert drounds == sorted(drounds), \
        "DRIVER_VERIFIED rows must rotate oldest-check-first"


def test_overdue_bump_self_disarms_when_fresh():
    """A row WITHIN the age bound must never appear in the overdue
    block — the bump exists only while the bound is exceeded, so it
    cannot permanently distort the age rotation."""
    _, overdue, _, last = _blocks()
    cur = max(last.values(), default=0)
    for k in overdue:
        assert last.get(k, 0) <= cur - contract.MAX_CHECK_AGE_ROUNDS


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

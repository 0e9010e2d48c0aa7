"""Driver-contract invariants for __ray_entry__: the CORRECTNESS gate
truncates at the first 50 enumerated queries, so the head's composition is
load-bearing — an accidental reorder or a dangling name silently un-gates
fresh surface."""

import sys

sys.path.insert(0, "/root/repo")


def test_gate_head_resolves_and_leads():
    import __ray_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    # every query has an oracle and vice versa
    assert set(q) == set(o)
    # the explicit head is exactly the first len(head) enumerated names
    head = [n for n in e._R5_GATE_HEAD]
    assert len(head) == 50
    assert len(set(head)) == 50, "duplicate name in gate head"
    assert q[: len(head)] == head, "head does not lead the enumeration"
    # the never-driver-green seven (r1-r4) and the round-5 additions must
    # all sit inside the gated 50
    must_gate = {
        "user_feature_matrix", "latest_event_per_user_type",
        "nearest_purchase_for_views", "user_value_trend",
        "views_before_purchase", "rolling_value_mean", "event_value_zscore",
        "session_spectral_features", "rolling_value_median",
        "group_weighted_sample", "contained_pairs_exact",
        "rolling_distinct_types",
    }
    assert must_gate <= set(q[:50])


def test_entry_callables_importable():
    import __ray_entry__ as e

    for name, fn in e.queries().items():
        assert callable(fn), name

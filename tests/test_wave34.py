"""Wave-34 operators: preference-pair mining, chat lint, curriculum
phases — planted-value tests."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_preference_pairs_margins_and_stratification(spark):
    rows = entry.queries()["q_preference_pairs"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.margin >= 0.2
        assert r.chosen_id != r.rejected_id
    # a chosen doc is never also a rejected doc within its source
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, ([], []))
        by_src[r.source][0].append(r.chosen_id)
        by_src[r.source][1].append(r.rejected_id)
    for chosen, rejected in by_src.values():
        assert not set(chosen) & set(rejected)


def test_chat_lint_flags_are_real(spark):
    rows = entry.queries()["q_chat_lint"](spark, SF).collect()
    # non-vacuous at adjudication scale (ADVICE r9): the ¼ threshold
    # flags ≥1 conversation even at sf0.001/sf0.01
    assert rows
    for r in rows:
        assert r.n_same_adjacent * 4 >= r.n_turns or r.n_roles == 1
        assert r.first_role is not None and r.n_turns >= 1


def test_curriculum_phases_exact_terciles(spark):
    rows = {r.phase: r for r in entry.queries()["q_curriculum_phases"](spark, SF).collect()}
    assert set(rows) == {0, 1, 2}
    n = sum(r.n_docs for r in rows.values())
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n == docs
    # exact tercile sizes: each phase within 1 of n/3
    for r in rows.values():
        assert abs(r.n_docs - n / 3) <= 1
    # phase 0 holds the highest scores, phase 2 the lowest
    assert rows[0].q6_min >= rows[1].q6_max >= rows[2].q6_max or (
        rows[0].q6_min >= rows[1].q6_max and rows[1].q6_min >= rows[2].q6_max
    )
    # fingerprints are distinct (different doc sets)
    assert len({r.id_fingerprint for r in rows.values()}) == 3

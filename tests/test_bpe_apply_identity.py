"""Property pin for the string identity behind the BPE oracles
(`bpe_first_merges`, `bpe_segment_docs`): applying a merge (p1, p2) to a
symbol sequence rendered as '|s1||s2||...|' via
``replace('|p1||p2|', '|p1p2|')`` must equal the greedy left-to-right
non-overlapping fold apply (the trainer's semantics, 'aaa' + (a,a) ->
['aa','a']). Python's str.replace, Spark's replace(), and DuckDB's
replace() all substitute non-overlapping occurrences left-to-right, so
proving the identity against the fold in pure Python carries to both
engines."""

from __future__ import annotations

from hypothesis import given, strategies as st

#: small alphabet forces dense pair collisions (the hard cases: runs of
#: identical symbols, overlapping candidate sites)
_SYM = st.sampled_from(["a", "b", "ab", "ba", "aa", "</w>"])


def _fold_apply(syms: list[str], p1: str, p2: str) -> list[str]:
    """The trainer's greedy fold (textstats._bpe_train_rules apply step)."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == p1 and s == p2:
            out[-1] = p1 + p2
        else:
            out.append(s)
    return out


def _replace_apply(syms: list[str], p1: str, p2: str) -> list[str]:
    """The oracle's string form: wrap, replace, unwrap."""
    s = "|" + "||".join(syms) + "|"
    s = s.replace(f"|{p1}||{p2}|", f"|{p1}{p2}|")
    return s[1:-1].split("||")


@given(st.lists(_SYM, min_size=1, max_size=12), _SYM, _SYM)
def test_replace_chain_equals_greedy_fold(syms, p1, p2):
    assert _replace_apply(syms, p1, p2) == _fold_apply(syms, p1, p2)


@given(
    st.lists(_SYM, min_size=1, max_size=10),
    st.lists(st.tuples(_SYM, _SYM), min_size=1, max_size=4),
)
def test_identity_holds_across_chained_merges(syms, rules):
    """Rank-ordered chains too: each round's output feeds the next, exactly
    how bpe_segment_docs applies all N_BPE_MERGES rules."""
    a, b = list(syms), list(syms)
    for p1, p2 in rules:
        a = _fold_apply(a, p1, p2)
        b = _replace_apply(b, p1, p2)
        assert a == b

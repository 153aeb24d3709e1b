"""BPE merge induction vs a pure-Python reference implementation."""

from __future__ import annotations

import collections


def py_bpe(word_counts, n_merges):
    """Reference BPE (Sennrich): greedy top-pair merges, tie-break by
    pair lexicographic order; stop when top freq < 2."""
    seqs = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for seq, c in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), freq = top
        if freq < 2:
            break
        merges.append((l, r, freq))
        out = {}
        for seq, c in seqs.items():
            new = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + c
        seqs = out
    return merges


def test_bpe_learn_matches_reference(spark):
    from sparkcollector.operators.corpus import bpe_learn

    docs = [
        (1, "low low low lower lower newest newest newest"),
        (2, "newest widest widest low lowest"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    wc = collections.Counter(
        w for _, t in docs for w in t.split() if w
    )
    expect = py_bpe(wc, 6)
    got = bpe_learn(df, n_merges=6)
    assert got == expect, (got, expect)
    # sanity: the classic corpus learns 'es'/'est'-family merges
    assert any(l + r == "es" for l, r, _ in got)


def test_bpe_segment_replays_merges(spark):
    from sparkcollector.operators.corpus import bpe_learn, bpe_segment

    df = spark.createDataFrame(
        [(1, "aaab aaab aaab ab")], "doc_id bigint, text string"
    )
    merges = bpe_learn(df, n_merges=2)
    out = bpe_segment(df, merges).collect()[0]["tokens"]
    # merges: (a,a) freq 6 -> aa; then (aa,ab)? pairs of "aa a b": (aa,a)=3,(a,b)=4
    # -> (a,b) freq 4 merges first round2. tokens of "aaab" = [aa, ab]
    assert merges[0][:2] == ("a", "a")
    assert merges[1][:2] == ("a", "b")
    assert out == ["aa", "ab", "aa", "ab", "aa", "ab", "ab"]


def test_bpe_stops_below_min_freq(spark):
    from sparkcollector.operators.corpus import bpe_learn

    df = spark.createDataFrame([(1, "xy")], "doc_id bigint, text string")
    # every pair occurs once -> no merge ever fires
    assert bpe_learn(df, n_merges=5) == []

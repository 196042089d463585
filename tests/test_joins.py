

def test_bloom_semi_anti_join_matches_exact(ray_session):
    """Bloom-prefiltered semi/anti joins return exactly the rows of the
    plain distributed semi/anti join (one-sided Bloom error is absorbed
    by re-verification / definite-miss routing), including null keys."""
    import ray.data as rd

    from docling_eval_ray.functions.joins import (
        bloom_semi_anti_join,
        semi_anti_join,
    )

    left = rd.from_items(
        [{"k": i % 97 if i % 11 else None, "v": i} for i in range(2000)]
    )
    right = rd.from_items([{"k": i} for i in range(0, 97, 3)])

    def key(t):
        return (t[0] is None, t[0] if t[0] is not None else 0, t[1])

    for anti in (False, True):
        got = sorted(
            ((r["k"], r["v"])
             for r in bloom_semi_anti_join(left, right, on="k",
                                           anti=anti).take_all()),
            key=key,
        )
        want = sorted(
            ((r["k"], r["v"])
             for r in semi_anti_join(left, right, on="k",
                                     anti=anti).take_all()),
            key=key,
        )
        assert got == want and len(got) > 0, ("anti" if anti else "semi")


def test_semi_anti_join_nullable_int_keys(ray_session):
    """Regression: one null in an integer key batch must not decay the
    whole batch to float64 before bucket hashing (the left side would
    hash floats while the null-free right side hashes ints, misrouting
    EVERY row of the batch — not just the null ones)."""
    import ray.data as rd

    from docling_eval_ray.functions.joins import hash_join, semi_anti_join

    left = rd.from_items(
        [{"k": i % 97 if i % 11 else None, "v": i} for i in range(2000)]
    )
    right = rd.from_items([{"k": i} for i in range(0, 97, 3)])
    exp_semi = sorted(
        (i % 97, i) for i in range(2000) if i % 11 and (i % 97) % 3 == 0
    )
    got_semi = sorted((r["k"], r["v"])
                      for r in semi_anti_join(left, right, on="k").take_all())
    assert got_semi == exp_semi

    exp_anti = sorted(
        (((i % 97 if i % 11 else None), i) for i in range(2000)
         if (i % 11 == 0) or (i % 97) % 3 != 0),
        key=lambda t: (t[0] is None, t[0] if t[0] is not None else 0, t[1]),
    )
    got_anti = sorted(
        ((r["k"], r["v"]) for r in
         semi_anti_join(left, right, on="k", anti=True).take_all()),
        key=lambda t: (t[0] is None, t[0] if t[0] is not None else 0, t[1]),
    )
    assert got_anti == exp_anti

    # hash_join shares the bucket tagger: inner join with nullable keys
    rj = rd.from_items([{"k": i, "w": i * 10} for i in range(0, 97, 3)])
    got_inner = sorted(
        (r["k"], r["v"], r["w"])
        for r in hash_join(left, rj, on="k").take_all()
    )
    exp_inner = sorted(
        (i % 97, i, (i % 97) * 10) for i in range(2000)
        if i % 11 and (i % 97) % 3 == 0
    )
    assert got_inner == exp_inner

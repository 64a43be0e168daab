"""Length/modality-grouped sampler tests (llava_trainer.py:81-173 parity)."""

import numpy as np

from video_llava_seg_tpu.data.sampler import (
    LengthGroupedSampler,
    get_length_grouped_indices,
    get_modality_length_grouped_indices,
    split_to_even_chunks,
)


def test_split_to_even_chunks_balances_totals():
    lengths = [10, 9, 8, 7, 2, 1, 1, 2]
    idx = sorted(range(8), key=lambda i: lengths[i], reverse=True)
    chunks = split_to_even_chunks(idx, lengths, 2)
    assert sorted(i for c in chunks for i in c) == list(range(8))
    totals = [sum(lengths[i] for i in c) for c in chunks]
    assert abs(totals[0] - totals[1]) <= 2


def test_length_grouped_is_permutation_and_sorted_within_megabatch():
    rng = np.random.RandomState(0)
    lengths = rng.randint(1, 100, 64).tolist()
    out = get_length_grouped_indices(lengths, 4, 2,
                                     np.random.RandomState(1))
    assert sorted(out) == list(range(64))


def test_modality_grouping_keeps_megabatches_pure():
    rng = np.random.RandomState(0)
    # >0 multimodal, <0 language-only (llava_trainer.py:103 convention)
    lengths = [int(l) for l in rng.randint(1, 50, 32)] + \
              [-int(l) for l in rng.randint(1, 50, 32)]
    bs, ws = 4, 2
    out = get_modality_length_grouped_indices(lengths, bs, ws,
                                              np.random.RandomState(1))
    assert sorted(out) == list(range(64))
    mb = bs * ws
    full = [out[i:i + mb] for i in range(0, 64, mb)]
    # all but possibly the last megabatch are modality-pure
    for m in full[:-1]:
        signs = {lengths[i] > 0 for i in m}
        assert len(signs) == 1


def test_sampler_iterates_all():
    s = LengthGroupedSampler(2, 2, lengths=[5, -3, 8, -2, 9, 1, -7, 4],
                             group_by_modality=True)
    assert sorted(iter(s)) == list(range(8))
    assert len(s) == 8


def test_prefetch_to_device_order_and_errors():
    import numpy as np
    import pytest

    from video_llava_seg_tpu.data.prefetch import prefetch_to_device

    batches = [{"x": np.full((2, 2), i)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))

    def bad():
        yield {"x": np.ones((1,))}
        raise RuntimeError("boom")

    it = prefetch_to_device(bad(), size=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)

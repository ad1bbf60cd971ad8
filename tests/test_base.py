"""Digit-decomposition helper tests, ported from the reference test suite
(reference: src/base.rs:110-439)."""

from fhe_ram_tpu.params import Base1D, Base2D, get_base_2d, reverse_bits_msb


def test_base1d_max():
    assert Base1D([4, 4, 4]).max() == 1 << 12
    assert Base1D([8, 8]).max() == 1 << 16
    assert Base1D([12]).max() == 1 << 12
    assert Base1D([1, 1, 1, 1]).max() == 1 << 4


def test_base1d_decomp_recomp_roundtrip():
    base = Base1D([4, 4, 4])
    for value in [0, 1, 15, 255, 1000, 4095]:
        d = base.decomp(value)
        assert base.recomp(d) == value
        assert len(d) == 3
        assert all(e < 16 for e in d)


def test_base1d_decomp_correctness():
    base = Base1D([4, 4, 4])
    assert base.decomp(0b0000_0000_1111) == [15, 0, 0]
    assert base.decomp(0b1010_1100_1111) == [15, 12, 10]


def test_base1d_gap():
    assert Base1D([4, 4, 4]).gap(12) == 1
    assert Base1D([6, 6]).gap(12) == 1
    assert Base1D([3, 3, 3, 3]).gap(12) == 1
    # reference semantics right-shifts log_n by each base (base.rs:16-21)
    assert Base1D([3, 3]).gap(12) == 1


def test_base2d_as_1d_and_max():
    b = Base2D([[4, 4], [4, 4]])
    assert b.as_1d() == Base1D([4, 4, 4, 4])
    assert b.max() == 1 << 16
    assert Base2D([[6], [6]]).max() == 1 << 12


def test_base2d_roundtrip():
    b = Base2D([[6, 6], [4, 4]])
    for value in [0, 1, 255, 1000, 65535, 32768, 4096]:
        assert b.recomp(b.decomp(value)) == value


def test_get_base_2d_shapes():
    # 2^18 addresses with [3,3,3,3] -> [[3,3,3,3],[3,3]] (SURVEY.md §2.1)
    b = get_base_2d(1 << 18, (3, 3, 3, 3))
    assert [r.bases for r in b.rows] == [(3, 3, 3, 3), (3, 3)]
    # 2^14 -> [[3,3,3,3],[2]]
    b = get_base_2d(1 << 14, (3, 3, 3, 3))
    assert [r.bases for r in b.rows] == [(3, 3, 3, 3), (2,)]
    # roundtrip
    for v in [0, 5, 1000, (1 << 14) - 1]:
        assert b.recomp(b.decomp(v)) == v


def test_base_edge_cases():
    empty = Base1D([])
    assert empty.max() == 1
    assert empty.decomp(0) == []
    assert empty.recomp([]) == 0
    single = Base1D([1])
    assert single.decomp(1) == [1]
    assert Base2D([]).max() == 1


def test_reverse_bits_msb():
    assert reverse_bits_msb(0, 4) == 0
    assert reverse_bits_msb(1, 4) == 8
    assert reverse_bits_msb(0b0011, 4) == 0b1100
    assert reverse_bits_msb(1, 12) == 2048

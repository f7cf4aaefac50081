import numpy as np

from frave_tpu.utils import (
    get_prev_power_two,
    pack_signed,
    unpack_signed,
    trunc_div,
    floor_log2,
)


def test_prev_power_two():
    # reference utils.rs:5-14 semantics
    assert get_prev_power_two(0) == 0
    assert get_prev_power_two(1) == 1
    assert get_prev_power_two(2) == 2
    assert get_prev_power_two(3) == 2
    assert get_prev_power_two(1023) == 512
    assert get_prev_power_two(1024) == 1024


def test_pack_unpack_signed_roundtrip():
    k = np.arange(-512, 512)
    packed = pack_signed(k)
    assert packed.min() == 0 and packed.max() == 1023
    assert np.array_equal(unpack_signed(packed), k)
    # exact reference mapping: 0,-1,1,-2,2 -> 0,1,2,3,4
    assert pack_signed(np.asarray([0, -1, 1, -2, 2])).tolist() == [0, 1, 2, 3, 4]


def test_trunc_div_matches_rust():
    a = np.arange(-17, 17)
    # Rust i32 division truncates toward zero
    expected = np.asarray([int(x / 2) if x >= 0 else -((-int(x)) // 2) for x in a])
    assert np.array_equal(trunc_div(a, 2), expected)
    assert trunc_div(np.asarray(-7), 2) == -3
    assert trunc_div(np.asarray(7), 2) == 3
    assert trunc_div(np.asarray(-7), 3) == -2


def test_floor_log2():
    assert floor_log2(1) == 0
    assert floor_log2(2) == 1
    assert floor_log2(3) == 1
    assert floor_log2(1024) == 10

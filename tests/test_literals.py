from frave_tpu.fractal.literals import LITERALS, generate_literals, calculate_depth_center

# The reference's hardcoded table (fractal.rs:51-86), used as the golden
# fixture for the re-derived generator.
REFERENCE_LITERALS = [
    (0, 1), (-1, 1), (2, 0), (-3, -1), (5, -1), (1, 3), (-11, -1), (9, -5),
    (13, 7), (-31, 3), (5, -17), (57, 11), (-67, 23), (-47, -45), (181, -1),
    (-87, 91), (-275, -89), (449, -93), (101, 271), (-999, -85), (797, -457),
    (1201, 627), (-2795, 287), (393, -1541), (5197, 967), (-5983, 2115),
    (-4411, -4049), (16377, -181), (-7555, 8279), (-25199, -7917),
]


def test_generator_matches_reference_table():
    assert list(generate_literals(30)) == REFERENCE_LITERALS
    assert list(LITERALS) == REFERENCE_LITERALS


def test_generator_extends_beyond_reference():
    # the generator is not capped at 30 entries like the reference table
    ext = generate_literals(40)
    assert list(ext[:30]) == REFERENCE_LITERALS
    assert len(ext) == 40


def test_calculate_depth_center():
    # reference wavelet_transform.rs:228-235 lookup semantics
    depth, center = calculate_depth_center(17, 8)
    assert depth == 9 and center == (1, 2)
    depth, _ = calculate_depth_center(100, 60)
    assert depth == 14

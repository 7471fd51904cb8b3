"""Analytic FLOPs model backing the bench MFU field (utils/profiling)."""

from tensorflow_yolo2_tpu.utils.profiling import (
    DARKNET19_DETECTION_SCHEDULE,
    V5E_PEAK_FLOPS,
    conv_flops_per_image,
)


def test_tiny_schedule_hand_computed():
    # 8² input, one 3×3 conv 3→4, pool to 4², one 1×1 conv 4→2:
    # 2·8·8·9·3·4 + 2·4·4·1·4·2 = 13824 + 256
    got = conv_flops_per_image(8, schedule=((3, 4), "M", (1, 2)))
    assert got == 2 * 8 * 8 * 9 * 3 * 4 + 2 * 4 * 4 * 4 * 2


def test_darknet19_448_magnitude():
    # Darknet19-448 detection fwd is ~33 GFLOPs (YOLO9000 reports ~8.5 B
    # MACs at 224² for the 19-conv classifier; the detection graph at
    # 448² with the 3 extra head convs lands ~4x higher)
    f = conv_flops_per_image(448)
    assert 3.0e10 < f < 3.6e10
    # quadratic in resolution
    assert abs(conv_flops_per_image(224) - f / 4) / f < 0.01


def test_schedule_matches_model_conv_count():
    convs = [s for s in DARKNET19_DETECTION_SCHEDULE if s != "M"]
    assert len(convs) == 22  # 18-conv core (no logits conv) + 4-conv head
    assert convs[-1] == (1, 30)
    assert "bf16" in V5E_PEAK_FLOPS and "int8" in V5E_PEAK_FLOPS

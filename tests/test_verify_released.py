"""The released-checkpoint parity harness (VERDICT r2 item 5).

Three layers of coverage:

1. the skip path runs unconditionally — an empty weights dir must exit 0
   with everything skipped (the "works today, gate tomorrow" contract);
2. the full import → serving path → golden-boxes → golden-check loop is
   exercised against a *generated* reference-convention TF checkpoint
   (same fixture as test_tf_import.build_tf_detector), including the
   mismatch-detection direction;
3. a skip-marked test against the REAL released weights
   ($TFY2_ROOT/weights/darknet19_pascal.ckpt) that activates the day the
   reference's Dropbox bundles (/root/reference/README.md:22-26) are
   mounted.
"""

import json
import os

import numpy as np
import pytest

from tensorflow_yolo2_tpu.config import Paths
from tensorflow_yolo2_tpu.entries import verify_released_ckpts as vrc


def test_skips_cleanly_when_no_weights(tmp_path, capsys):
    rc = vrc.main(["--weights-dir", str(tmp_path), "--images"])
    out = capsys.readouterr().out
    assert rc == 0
    summary = json.loads(out.splitlines()[-1].split("VERIFY ", 1)[1])
    assert summary["ran"] == []
    assert set(summary["skipped"]) == {
        "darknet19_pascal", "darknet19_imagenet", "resnet50_pascal"}


@pytest.mark.slow
def test_generated_ckpt_roundtrip_and_golden_check(tmp_path, capsys):
    tf = pytest.importorskip("tensorflow")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synthetic import make_image
    from test_tf_import import build_tf_detector

    weights = tmp_path / "weights"
    weights.mkdir()
    img_path = str(tmp_path / "demo.jpg")
    make_image(img_path, 320, 240, seed=5,
               boxes=[(30, 30, 150, 130), (170, 90, 290, 210)])

    rng = np.random.RandomState(11)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        build_tf_detector(v1, np.zeros((1, 64, 64, 3), np.float32), rng)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            saver.save(sess, str(weights / "darknet19_pascal.ckpt"))

    golden = str(tmp_path / "golden.json")
    # random weights produce near-uniform confidences; threshold low so
    # some boxes survive and the golden file is non-trivial
    base = ["--weights-dir", str(weights), "--images", img_path,
            "--threshold=-1e9"]  # =-form: argparse's negative-number
    # matcher doesn't recognize scientific notation as a value
    assert vrc.main(base + ["--golden-out", golden]) == 0
    first = capsys.readouterr().out
    assert "ARTIFACT" in first and "darknet19_pascal" in first
    recs = json.load(open(golden))["records"]
    assert recs and recs[0]["boxes"], "golden file should carry boxes"

    # identical rerun passes the check
    assert vrc.main(base + ["--golden-check", golden]) == 0
    capsys.readouterr()

    # a perturbed golden file must FAIL the check (detects box drift)
    recs[0]["boxes"][0][0] += 5.0
    bad = str(tmp_path / "bad.json")
    json.dump({"records": recs}, open(bad, "w"))
    assert vrc.main(base + ["--golden-check", bad]) == 1
    assert "GOLDEN MISMATCH" in capsys.readouterr().out


_real = os.path.join(Paths().weights, "darknet19_pascal.ckpt")


@pytest.mark.skipif(
    not (os.path.exists(_real) or os.path.exists(_real + ".index")),
    reason="released reference weights not mounted "
           "(README.md:22-26 Dropbox bundles)")
def test_released_weights_golden_boxes():
    """Activates automatically once the real released ckpts exist."""
    rc = vrc.main(["--images", "assets/demo.jpg"])
    assert rc == 0
    assert "darknet19_pascal" in vrc.RESULT["ran"]

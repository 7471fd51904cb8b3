"""CLI entry points mirroring the reference's public script surface
(SURVEY §2 items 12-22): pascal_detect_darknet, pascal_train_darknet,
pascal_detect_resnet, pascal_train_resnet, imagenet_train_darknet,
imagenet_test_darknet, imagenet_predict_darknet, flowers_train, plus the
slim-tier unified train_classifier / eval_classifier.

Each is runnable as ``python -m tensorflow_yolo2_tpu.entries.<name>``.
Unlike the reference (hard-coded hypers per script), every entry takes
CLI overrides via argparse.
"""

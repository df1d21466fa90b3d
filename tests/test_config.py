"""Config importers against the actual reference parameter files."""

import os

import pytest

from kimera_multi_tpu.io import config

REF = "/root/reference/params/D455"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference params not mounted")


def test_lcd_params_yaml():
    y = config.load_opencv_yaml(os.path.join(REF, "LcdParams.yaml"))
    assert y["use_nss"] == 1
    assert y["alpha"] == 0.4
    assert y["lowe_ratio"] == 0.7
    assert y["ransac_max_iterations"] == 500
    assert y["ransac_threshold_2d2d"] == 1e-06
    assert y["ransac_threshold_3d3d"] == 0.3
    assert y["ransac_randomize"] == 0
    assert y["gnc_alpha"] == 0.9


def test_frontend_params_yaml():
    y = config.load_opencv_yaml(os.path.join(REF, "FrontendParams.yaml"))
    assert y["klt_win_size"] == 24
    assert y["klt_max_level"] == 4
    assert y["maxFeaturesPerFrame"] == 300
    assert y["min_intra_keyframe_time"] == 0.2
    assert y["max_intra_keyframe_time"] == 5.0


def test_pipeline_flags():
    flags = config.load_gflags(
        os.path.join(REF, "flags", "Pipeline.flags"))
    assert "deterministic_random_number_generator" in flags


def test_params_folder_and_frontend_config():
    folder = config.load_params_folder(REF)
    assert "LcdParams" in folder and "flags" in folder
    fc = config.lcd_params_from_reference(REF)
    assert fc.ransac_hyp == 500
    assert fc.min_mono_inliers == 10
    assert fc.min_stereo_inliers == 5
    assert fc.lcd.alpha == 0.4
    assert fc.lcd.recent_frames_window == 100

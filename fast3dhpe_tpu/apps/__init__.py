"""CLI entry points mirroring the reference's scripts.

  python -m fast3dhpe_tpu.apps.train --config_path configs/mpii.yaml
  python -m fast3dhpe_tpu.apps.train_cdr --config_path configs/mads_3d.yaml
  python -m fast3dhpe_tpu.apps.inference --config_path configs/mads_3d.yaml \
      --movement HipHop [--save_frames N]
  python -m fast3dhpe_tpu.apps.baseline --config_path configs/mads_2d.yaml
  python -m fast3dhpe_tpu.apps.extract_data --depth_data_path ... \
      --multiview_data_path ... --output_path ... [--undistort] \
      [--rectify_stereo]
"""

#!/usr/bin/env python3
"""Run EVE inference on one video and write a PoG-overlay mp4.

Usage mirrors the reference (README.md:60-71):

    python inference.py --input-path <eve>/val01/step008_image_xyz/webcam_c.mp4 \
        --output-path out.mp4 [--resume-from <run_dir>]
"""

import logging
import os

import numpy as np

from eve_tpu import infer
from eve_tpu.utils.visualization import (
    COLOR_FINAL, COLOR_GT, COLOR_INITIAL, VideoEncoder, draw_pog_overlay)

logger = logging.getLogger(__name__)


def main():
    config = infer.script_init_common()
    dataset, dataloader = infer.init_dataset(config)
    spec, params = infer.model_setup(config)

    output_dir = os.path.dirname(config.output_path)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    encoder = VideoEncoder(config.output_path, fps=config.assumed_frame_rate)

    for step, inputs, outputs in infer.iterator(
            spec, params, dataloader, streaming=config.inference_streaming):
        we_have_gt = 'left_g_gt' in outputs
        all_PoG_init = outputs['PoG_px_initial']
        all_PoG_final = outputs.get('PoG_px_final')
        all_PoG_gt = outputs.get('PoG_px_gt')
        all_gt_validity = outputs.get('PoG_px_gt_validity')
        num_entries, sequence_len = all_PoG_init.shape[:2]

        # Screen frames for the canvas: full 1080p recording when loaded,
        # else upscaled screen content.
        if 'screen_full_frame' in inputs:
            screens = inputs['screen_full_frame']  # (B, T, H, W, 3) RGB uint8
        else:
            import cv2
            sf = np.asarray(inputs['screen_frame'])
            if sf.dtype != np.uint8:  # host-normalized [0, 1] floats
                sf = (sf * 255).astype(np.uint8)
            screens = np.stack([
                np.stack([cv2.resize(f, (1920, 1080)) for f in clip])
                for clip in sf])

        # PoG predictions live in actual_screen_size (1920x1080) pixel
        # coordinates (reference src/inference.py draws them on the 1080p
        # recording directly); scale to the canvas so smaller stand-in
        # recordings render correctly too. Identity on real EVE data.
        canvas_h, canvas_w = screens.shape[2:4]
        aw, ah = config.actual_screen_size
        pog_scale = np.array([canvas_w / aw, canvas_h / ah], np.float32)
        all_PoG_init = np.asarray(all_PoG_init) * pog_scale
        if all_PoG_final is not None:
            all_PoG_final = np.asarray(all_PoG_final) * pog_scale
        if all_PoG_gt is not None:
            all_PoG_gt = np.asarray(all_PoG_gt) * pog_scale

        eyes = None
        if 'left_eye_patch' in inputs:
            le = np.asarray(inputs['left_eye_patch'])
            re = np.asarray(inputs['right_eye_patch'])
            strip = np.concatenate([re, le], axis=3)  # (B, T, H, 2W, 3)
            if strip.dtype == np.uint8:
                eyes = strip
            else:  # host-normalized [-1, 1] floats
                eyes = ((strip + 1.0) * (255.0 / 2.0)).astype(np.uint8)

        for index in range(num_entries):
            to_draw = [('Initial Estimate', all_PoG_init[index],
                        np.ones(sequence_len, bool), COLOR_INITIAL)]
            if all_PoG_final is not None:
                to_draw.append(('After Refinement (Ours)',
                                all_PoG_final[index],
                                np.ones(sequence_len, bool), COLOR_FINAL))
            if we_have_gt and all_PoG_gt is not None:
                to_draw.append(('Tobii Data (Groundtruth)',
                                all_PoG_gt[index],
                                all_gt_validity[index].astype(bool),
                                COLOR_GT))
            for t in range(sequence_len):
                frame = np.ascontiguousarray(screens[index, t][:, :, ::-1])
                eyes_bgr = (eyes[index, t][:, :, ::-1]
                            if eyes is not None else None)
                have_pog_gt = we_have_gt and all_PoG_gt is not None
                draw_pog_overlay(
                    frame, to_draw, eyes_bgr=eyes_bgr,
                    draw_gt_lines=have_pog_gt,
                    gt=all_PoG_gt[index] if have_pog_gt else None,
                    gt_validity=(all_gt_validity[index].astype(bool)
                                 if have_pog_gt else None),
                    t=t, ui_scale=canvas_w / aw)
                encoder.write(frame)

    encoder.close()
    print('> Wrote %s' % config.output_path)


if __name__ == '__main__':
    main()

"""Standalone depth metric analyzer CLI (reference root ``eval_depth.py``
used as a script; the library lives in ``evaluation/depth_analyzer.py``).
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description='Depth metric analyzer')
    parser.add_argument('--image_list', type=str, required=True)
    parser.add_argument('--gt_list', type=str, required=True)
    parser.add_argument('--pred_list', type=str, required=True)
    parser.add_argument('--min_depth', type=float, default=0.01)
    parser.add_argument('--max_depth', type=float, default=80.0)
    parser.add_argument('--gt_crop', type=int, nargs=4,
                        default=[44, 1197, 153, 371])
    parser.add_argument('--median_scaling', type=str, default='none')
    parser.add_argument('--out_dir', type=str, default='analysis_output')
    args = parser.parse_args(argv)

    from mindtheedge_tpu.config.node import ConfigNode
    from mindtheedge_tpu.evaluation.depth_analyzer import (
        DepthEvalLoader, DensePredictionAnalyzer)

    cfg = ConfigNode({
        'min_depth': args.min_depth, 'max_depth': args.max_depth,
        'gt_crop': args.gt_crop, 'median_scaling': args.median_scaling,
        'eval_mask_image_list': ''})
    loader = DepthEvalLoader(args.image_list, args.gt_list, args.pred_list)
    analyzer = DensePredictionAnalyzer(cfg)
    for i in range(len(loader)):
        _, gt, d = loader[i]
        analyzer.eval_frame(i, gt, d)
    df = analyzer.get_frm_metrics_df()
    analyzer.save_results(args.out_dir, 'analyzer_data.pkl')
    import os
    csv_path = os.path.join(args.out_dir, 'mean_frames_depth_metrics.csv')
    df.mean().to_csv(csv_path)
    print(df.mean())
    print(f'-> {csv_path}')


if __name__ == '__main__':
    main()

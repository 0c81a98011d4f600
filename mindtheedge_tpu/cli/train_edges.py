"""Training CLI (reference root ``train_edges.py``).

``python -m mindtheedge_tpu.cli.train_edges <config.yaml|checkpoint.ckpt>``
"""

import argparse


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description='Edge-aware depth training')
    parser.add_argument('file', type=str,
                        help='Input file (.yaml config or .ckpt to resume)')
    return parser.parse_args(argv)


def train(file):
    from mindtheedge_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()
    import jax
    from mindtheedge_tpu.config import parse_train_file
    from mindtheedge_tpu.training.experiment import Experiment

    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/mte_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    config, resume_ckpt = parse_train_file(file)
    print(f'Run name: {config.name}; resume: {resume_ckpt}')
    exp = Experiment(config, resume_ckpt=resume_ckpt)
    exp.fit()


def main(argv=None):
    args = parse_args(argv)
    train(args.file)


if __name__ == '__main__':
    main()

"""Trainer API shims (reference ``trainers/{base,common,horovod}_trainer.py``).

The reference splits orchestration between ModelWrapper and three trainer
classes; here one ``Experiment`` owns the loop.  These shims keep the
reference's ``Trainer(**config.arch).fit(module)`` call shape working:

* ``CommonTrainer`` — single-host trainer (reference ``common_trainer.py``).
* ``HorovodTrainer`` — name kept for API parity; on TPU the same code path
  data-parallelizes over the device mesh (there is no separate process-model
  trainer; the reference's Horovod trainer was vestigial and mis-imported,
  ``horovod_trainer.py:12`` — documented divergence).
"""


class CommonTrainer:
    def __init__(self, min_epochs=1, max_epochs=50, validate_first=False,
                 seed=42, **kwargs):
        self.min_epochs = min_epochs
        self.max_epochs = max_epochs
        self.validate_first = validate_first

    def fit(self, experiment):
        """experiment: a ``training.experiment.Experiment``."""
        experiment.config.arch.max_epochs = self.max_epochs
        if self.validate_first and experiment.val_loader is not None:
            first = next(iter(experiment.train_loader))
            if experiment.state is None:
                experiment.initialize_state(first)
            experiment.validate()
        return experiment.fit()

    def test(self, experiment):
        assert experiment.test_loader is not None, 'No test dataset'
        return experiment.validate()


# On TPU, data parallelism lives inside the compiled step (mesh sharding),
# so the distributed trainer is the same trainer.
HorovodTrainer = CommonTrainer

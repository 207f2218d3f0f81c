"""Seeded reproducibility (SURVEY §C22): identical seeds -> identical runs."""

import numpy as np

from ser_tpu.data.loaders import get_loaders
from ser_tpu.data.synthetic import generate_iemocap_pickles
from ser_tpu.train.trainer import ModelTrainer
from ser_tpu.utils import seed_everything


def test_same_seed_same_training_run(tmp_path):
    fp = generate_iemocap_pickles(str(tmp_path), n_train=10, n_test=4,
                                  min_len=4, max_len=10, seed=7)

    def run():
        seed_everything(111)
        train, _, test = get_loaders(fp, batch_size=5, valid=0.2,
                                     n_classes=6, seed=111)
        tr = ModelTrainer(model="MARN1_onlysp", seed=111, res_csv_path=None)
        losses = [tr.train_network(ep, train)[1] for ep in (1, 2)]
        acc, f1, _ = tr.eval_network(test, dump_csv=False)
        return losses, acc, f1

    a = run()
    b = run()
    assert a == b, (a, b)


def test_different_seed_different_run(tmp_path):
    fp = generate_iemocap_pickles(str(tmp_path), n_train=10, n_test=4,
                                  min_len=4, max_len=10, seed=8)
    train, _, _ = get_loaders(fp, batch_size=5, valid=0.2, n_classes=6,
                              seed=111)
    l1 = ModelTrainer(model="MARN1_onlysp", seed=111,
                      res_csv_path=None).train_network(1, train)[1]
    train.rng = np.random.default_rng(0)
    l2 = ModelTrainer(model="MARN1_onlysp", seed=222,
                      res_csv_path=None).train_network(1, train)[1]
    assert l1 != l2

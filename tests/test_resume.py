"""Training resume: full state (params + optimizer + step) restores and
continues — a capability the reference lacks (restart-from-best only,
model.py:81-83)."""

import numpy as np
import pytest

from tpuseg.data.build_db import serialize_image_mask_pair
from tpuseg.data.recordstore import RecordWriter
from tpuseg.train.trainer import TrainConfig, train_model


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    rng = np.random.default_rng(0)

    def make(path, n):
        w = RecordWriter(str(path))
        for i in range(n):
            img = rng.normal(500, 100, (32, 32, 1)).astype(np.uint16)
            msk = (img[..., 0] > 500).astype(np.uint8)
            classes = ",".join(str(c) for c in np.unique(msk))
            w.put(f"img{i:03d}:{classes}", serialize_image_mask_pair(img, msk))
        w.close()
        return str(path)

    return make(root / "train-r.lmdb", 8), make(root / "test-r.lmdb", 4)


def test_resume_continues_from_checkpoint(dbs, tmp_path):
    train_db, test_db = dbs
    base = dict(
        train_database=train_db, test_database=test_db,
        batch_size=1, test_every_n_steps=2, early_stopping_count=10,
        use_augmentation=False, device_augment=False, dtype="float32",
        base_features=2, seed=0,
    )
    out1 = str(tmp_path / "first")
    r1 = train_model(TrainConfig(output_folder=out1, max_epochs=1, **base))

    out2 = str(tmp_path / "second")
    r2 = train_model(TrainConfig(output_folder=out2, max_epochs=1,
                                 resume_checkpoint=r1.checkpoint_path, **base))
    # resumed run continues and produces finite losses from the restored state
    assert np.isfinite(r2.final_train_loss)
    assert len(r2.test_loss) == 1

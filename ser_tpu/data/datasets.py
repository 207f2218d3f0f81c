"""Dataset readers for the reference pickle schemas.

Schema (ref ``/root/reference/dataloader.py``):
- IEMOCAP main pickle: 9-tuple (videoIDs, videoSpeakers, videoLabels,
  videoText, videoAudio, videoVisual, videoSentence, trainVid, testVid)
  (``dataloader.py:13-15``).
- COSMIC RoBERTa pickle: 10-tuple (speakers, labels, roberta1..4, sentences,
  trainIds, testIds, validIds) (``dataloader.py:17-20``). The reference
  hard-codes an absolute path; here it defaults to
  ``<dir>/iemocap_features_roberta.pkl`` next to the main pickle and is
  overridable.
- MELD main pickle: 9-tuple with 3- or 7-class labels in different slots
  (``dataloader.py:52-60``).

Items are plain numpy arrays; label maps: IEMOCAP {hap 0, sad 1, neu 2,
ang 3, exc 4, fru 5}; MELD-7 {neutral 0, surprise 1, fear 2, sadness 3,
joy 4, disgust 5, anger 6}.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def _f32(x):
    return np.asarray(x, dtype=np.float32)


class IEMOCAPDataset:
    """IEMOCAP dialogues with RoBERTa text views (ref ``dataloader.py:10-47``)."""

    N_FIELDS = 10  # r1 r2 r3 r4 visual audio qmask umask label vid (+ wav)

    def __init__(self, path, train=True, roberta_path=None, wav_path=None):
        with open(path, "rb") as f:
            (
                self.videoIDs,
                self.videoSpeakers,
                self.videoLabels,
                self.videoText,
                self.videoAudio,
                self.videoVisual,
                self.videoSentence,
                self.trainVid,
                self.testVid,
            ) = pickle.load(f, encoding="latin1")

        if roberta_path is None:
            roberta_path = os.path.join(
                os.path.dirname(path), "iemocap_features_roberta.pkl"
            )
        with open(roberta_path, "rb") as f:
            (
                self.speakers,
                self.labels,
                self.roberta1,
                self.roberta2,
                self.roberta3,
                self.roberta4,
                self.sentences,
                self.trainIds,
                self.testIds,
                self.validIds,
            ) = pickle.load(f, encoding="latin1")

        # Optional raw-audio table ({vid: [n_utt, T] float32}) consumed by
        # the on-device MFCC front-end (ser_tpu.data.frontend); when present
        # items carry an 11th 'wav' field after vid.
        self.videoWav = None
        if wav_path is not None:
            with open(wav_path, "rb") as f:
                self.videoWav = pickle.load(f, encoding="latin1")

        self.keys = list(self.trainVid if train else self.testVid)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        vid = self.keys[index]
        qmask = _f32(
            [[1, 0] if x == "M" else [0, 1] for x in self.videoSpeakers[vid]]
        )
        n = len(self.videoLabels[vid])
        item = (
            _f32(self.roberta1[vid]),
            _f32(self.roberta2[vid]),
            _f32(self.roberta3[vid]),
            _f32(self.roberta4[vid]),
            _f32(self.videoVisual[vid]),
            _f32(self.videoAudio[vid]),
            qmask,
            np.ones(n, dtype=np.float32),
            np.asarray(self.videoLabels[vid], dtype=np.int32),
            vid,
        )
        if self.videoWav is not None:
            item = item + (_f32(self.videoWav[vid]),)
        return item


class MELDDataset:
    """MELD dialogues (ref ``dataloader.py:50-92``); field 4 is the 600-d
    sentence-CNN text feature (slot name kept as 'visual' position for wire
    compatibility with the IEMOCAP tuple ordering)."""

    N_FIELDS = 10

    def __init__(self, path, n_classes, train=True, roberta_path=None):
        with open(path, "rb") as f:
            loaded = pickle.load(f, encoding="latin1")
        if n_classes == 3:
            (
                self.videoIDs,
                self.videoSpeakers,
                _,
                self.videoText,
                self.videoAudio,
                self.videoSentence,
                self.trainVid,
                self.testVid,
                self.videoLabels,
            ) = loaded
        elif n_classes == 7:
            (
                self.videoIDs,
                self.videoSpeakers,
                self.videoLabels,
                self.videoText,
                self.videoAudio,
                self.videoSentence,
                self.trainVid,
                self.testVid,
                _,
            ) = loaded
        else:
            raise ValueError(f"MELD supports 3 or 7 classes, got {n_classes}")

        if roberta_path is None:
            roberta_path = os.path.join(
                os.path.dirname(path), "meld_features_roberta.pkl"
            )
        with open(roberta_path, "rb") as f:
            (
                self.speakers,
                self.emotion_labels,
                self.sentiment_labels,
                self.roberta1,
                self.roberta2,
                self.roberta3,
                self.roberta4,
                self.sentences,
                self.trainIds,
                self.testIds,
                self.validIds,
            ) = pickle.load(f, encoding="latin1")

        self.keys = list(self.trainVid if train else self.testVid)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        vid = self.keys[index]
        n = len(self.videoLabels[vid])
        return (
            _f32(self.roberta1[vid]),
            _f32(self.roberta2[vid]),
            _f32(self.roberta3[vid]),
            _f32(self.roberta4[vid]),
            _f32(self.videoText[vid]),
            _f32(self.videoAudio[vid]),
            _f32(self.videoSpeakers[vid]),
            np.ones(n, dtype=np.float32),
            np.asarray(self.videoLabels[vid], dtype=np.int32),
            vid,
        )


class IEMOCAPRobertaCometDataset:
    """RoBERTa + 9 COMET commonsense relation tensors
    (ref ``dataloader.py:95-143``). Unused by the trainers but part of the
    data surface; items are 17-field tuples (r1..r4, 9 comet relations,
    qmask, umask, label, vid)."""

    N_FIELDS = 17
    COMET_KEYS = ("xIntent", "xAttr", "xNeed", "xWant", "xEffect", "xReact",
                  "oWant", "oEffect", "oReact")

    def __init__(self, split, roberta_path, comet_path):
        with open(roberta_path, "rb") as f:
            (
                self.speakers,
                self.labels,
                self.roberta1,
                self.roberta2,
                self.roberta3,
                self.roberta4,
                self.sentences,
                self.trainIds,
                self.testIds,
                self.validIds,
            ) = pickle.load(f, encoding="latin1")
        with open(comet_path, "rb") as f:
            comet = pickle.load(f, encoding="latin1")
        for name, table in zip(self.COMET_KEYS, comet):
            setattr(self, name, table)

        if split == "train":
            self.keys = list(self.trainIds)
        elif split == "test":
            self.keys = list(self.testIds)
        elif split == "valid":
            self.keys = list(self.validIds)
        else:
            raise ValueError(f"unknown split: {split}")

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        vid = self.keys[index]
        qmask = _f32(
            [[1, 0] if x == "M" else [0, 1] for x in self.speakers[vid]]
        )
        n = len(self.labels[vid])
        fields = [
            _f32(self.roberta1[vid]),
            _f32(self.roberta2[vid]),
            _f32(self.roberta3[vid]),
            _f32(self.roberta4[vid]),
        ]
        fields += [_f32(getattr(self, k)[vid]) for k in self.COMET_KEYS]
        fields += [
            qmask,
            np.ones(n, dtype=np.float32),
            np.asarray(self.labels[vid], dtype=np.int32),
            vid,
        ]
        return tuple(fields)

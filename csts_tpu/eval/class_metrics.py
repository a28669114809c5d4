"""Classification metrics for the MViT family: top-k accuracy and confusion matrix.

Reference: ``slowfast/utils/metrics.py`` upstream topks_correct (dropped in the CSTS
fork) and ``slowfast/visualization/utils.py:158-254`` confusion-matrix machinery.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def topks_correct(preds: jax.Array, labels: jax.Array, ks: Sequence[int]) -> List[jax.Array]:
    """Number of top-k correct predictions per k. preds (B, C), labels (B,)."""
    max_k = max(ks)
    _, top_idx = jax.lax.top_k(preds, max_k)  # (B, max_k)
    correct = top_idx == labels[:, None]
    return [jnp.sum(jnp.any(correct[:, :k], axis=1)) for k in ks]


def topk_accuracies(preds, labels, ks: Sequence[int] = (1, 5)) -> List[float]:
    n = preds.shape[0]
    return [float(c) / n * 100.0 for c in topks_correct(jnp.asarray(preds), jnp.asarray(labels), ks)]


def topk_errors(preds, labels, ks: Sequence[int] = (1, 5)) -> List[float]:
    return [100.0 - a for a in topk_accuracies(preds, labels, ks)]


def confusion_matrix(preds: np.ndarray, labels: np.ndarray, num_classes: int) -> np.ndarray:
    """(num_classes, num_classes) counts, rows = true class."""
    pred_cls = np.asarray(preds).argmax(axis=-1) if np.asarray(preds).ndim > 1 else np.asarray(preds)
    labels = np.asarray(labels).astype(np.int64)
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (labels, pred_cls.astype(np.int64)), 1)
    return cm


def plot_topk_histogram(class_name, counts: np.ndarray, k: int = 10,
                        class_names=None, path: str = None):
    """Histogram of the top-k most frequently predicted classes for one true class
    (visualization/utils.py plot_topk_histogram; fed by a confusion-matrix row)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    counts = np.asarray(counts, np.float64)
    k = min(k, counts.shape[0])
    top = np.argsort(counts)[::-1][:k]
    names = (
        [str(class_names[i]) for i in top] if class_names is not None
        else [str(i) for i in top]
    )
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.bar(range(k), counts[top])
    ax.set_xticks(range(k))
    ax.set_xticklabels(names, rotation=90)
    ax.set_title(f"Top-{k} predictions for true class {class_name}")
    ax.set_ylabel("count")
    fig.tight_layout()
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_confusion_matrix(cm: np.ndarray, class_names=None, path: str = None):
    """Render with matplotlib if available (visualization/utils.py:190-230)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(cm, cmap="Blues")
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    if class_names is not None and len(class_names) <= 30:
        ax.set_xticks(range(len(class_names)))
        ax.set_yticks(range(len(class_names)))
        ax.set_xticklabels(class_names, rotation=90)
        ax.set_yticklabels(class_names)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig

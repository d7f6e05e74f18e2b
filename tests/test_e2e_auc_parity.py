"""End-to-end AUC-parity north star (BASELINE.json): reference vs ours.

Runs the reference's OWN ``train_models.py`` k-fold loop (CPU oracle via
tools/ref_oracle.py — stubbed viz deps, cuda→cpu) and this framework's
``train_kfold`` over IDENTICAL artifacts (HDF5 feature stores, merged
parquet, generated kfold YAML) from a synthetic cohort with a planted
class signal, and asserts per-fold test AUC within 0.5%
(train_models.py:744-745 metric).  The checked-in ``PARITY_AUC.json`` is
the full 5-fold version of the same harness (tools/auc_parity.py --full).
"""

import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from auc_parity import (  # noqa: E402
    build_parity_project,
    compare_aucs,
    run_our_trainer,
    run_reference_trainer,
)


@pytest.fixture(scope="module")
def parity_runs(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity") / "proj"
    # Twin patients (identical mid-margin features, opposite labels,
    # same test fold) force one tied ROC pair per fold: converged AUC
    # is capped below 1.0 deterministically and identically for both
    # trainers, so parity is between non-trivial data-limited AUCs,
    # not 1.0==1.0.  The shared features carry a 0.4·signal shift so
    # the pair's common score sits INSIDE the margin — every
    # twin-vs-nontwin ordering is robust (see data/synthetic.py).
    project, df = build_parity_project(
        root, n_patients=12, n_folds=2, num_epochs=6,
        twins=((2, 3), (8, 9)),
    )
    ref = run_reference_trainer(project["root"])
    ours = run_our_trainer(project, df)
    return ref, ours


class TestAUCParityNorthStar:
    def test_per_fold_auc_within_half_percent(self, parity_runs):
        ref, ours = parity_runs
        result = compare_aucs(ref, ours, tol=0.005)
        assert result["all_within_tol"], result

    def test_batched_trainer_keeps_parity(self, parity_runs,
                                          tmp_path_factory):
        """batch_size=2 must land on the SAME converged AUC as the
        reference's batch-1 loop: virtual batches count samples, so the
        update boundaries and sample-mean gradients are unchanged."""
        ref, _ = parity_runs
        root = tmp_path_factory.mktemp("parity_b2") / "proj"
        project, df = build_parity_project(
            root, n_patients=12, n_folds=2, num_epochs=6,
            twins=((2, 3), (8, 9)),
        )
        ours_b2 = run_our_trainer(project, df, batch_size=2)
        result = compare_aucs(ref, ours_b2, tol=0.005)
        assert result["all_within_tol"], result

    def test_both_trainers_learn(self, parity_runs):
        """Guard against vacuous parity: the planted signal must actually
        be learned (final AUC ≫ chance) by BOTH trainers."""
        ref, ours = parity_runs
        for fold in ref:
            assert ref[fold][-1] > 0.9, (fold, ref[fold])
            assert ours[fold][-1] > 0.9, (fold, ours[fold])

    def test_parity_is_not_vacuous(self, parity_runs):
        """The discordant patients must cap at least one fold's AUC
        strictly below 1.0 — i.e. the harness compares real, data-limited
        rankings on both sides, not a trivially separable cohort."""
        ref, ours = parity_runs
        assert any(ref[f][-1] < 0.999 for f in ref), ref
        assert any(ours[f][-1] < 0.999 for f in ours), ours

    def test_reference_epochs_complete(self, parity_runs):
        ref, _ = parity_runs
        assert all(len(v) == 6 for v in ref.values()), {
            k: len(v) for k, v in ref.items()}


class TestGradedCohortDesign:
    """design_graded_cohort: the non-saturated parity regime's designed
    fold caps must be fold-varying, mid-range, and consistent with the
    split contract (seed-42 StratifiedKFold, split_patients.py:23-34)."""

    def test_full_spec_caps_are_fold_varying(self):
        from auc_parity import GRADED_PLANTS_FULL, design_graded_cohort

        alphas, plants, caps = design_graded_cohort(
            30, 5, GRADED_PLANTS_FULL)
        assert caps == {0: pytest.approx(8 / 9), 1: pytest.approx(7 / 9),
                        2: pytest.approx(6 / 9), 3: 1.0,
                        4: pytest.approx(8 / 9)}
        # mid-range: at least 3 distinct non-saturated values
        assert len({round(c, 6) for c in caps.values()}) >= 4
        assert max(caps.values()) - min(caps.values()) >= 0.3

    def test_plants_keep_their_labels_and_are_interior(self):
        from auc_parity import GRADED_PLANTS_FULL, design_graded_cohort

        alphas, plants, _ = design_graded_cohort(
            30, 5, GRADED_PLANTS_FULL)
        for k, entries in plants.items():
            for e in entries:
                # patient label is i % 2 (write_synthetic_feature_store)
                assert e["label"] == e["patient"] % 2
                assert abs(e["position"]) < 1.0      # inside the margin
                assert alphas[e["patient"]] == e["position"]
        # each patient planted at most once (test folds are disjoint)
        all_ids = [e["patient"] for es in plants.values() for e in es]
        assert len(all_ids) == len(set(all_ids)) == len(alphas)

    def test_cap_matches_roc_of_designed_positions(self):
        """The designed cap IS roc_auc(labels, positions) with cleans at
        ±1 — recomputed here independently per fold."""
        from sklearn.metrics import roc_auc_score
        from sklearn.model_selection import StratifiedKFold

        import numpy as np

        from auc_parity import GRADED_PLANTS_QUICK, design_graded_cohort

        n = 12
        alphas, _, caps = design_graded_cohort(n, 2, GRADED_PLANTS_QUICK)
        labels = np.arange(n) % 2
        skf = StratifiedKFold(2, shuffle=True, random_state=42)
        for k, (_, te) in enumerate(skf.split(np.zeros(n), labels)):
            y = labels[te]
            score = [alphas.get(int(i), 2.0 * labels[i] - 1.0)
                     for i in te]
            assert caps[k] == pytest.approx(roc_auc_score(y, score))

    def test_exhausted_pool_is_an_error(self):
        from auc_parity import design_graded_cohort

        with pytest.raises(ValueError, match="no unplanted"):
            design_graded_cohort(
                8, 2, {0: [(1, -0.1), (1, -0.2), (1, -0.3)]})

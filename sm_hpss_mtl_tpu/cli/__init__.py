"""Experiment entry points mirroring the reference scripts:

- ``baseline``       Baseline_Results.py (4 single-task models)
- ``mtl``            Proposed_Work_Results.py (MTL / Cascaded MTL)
- ``make_folds``     create_cross_validation_folds{,_5_class}.py
- ``hpss_resynth``   the missing hpss_audio/ generation script
- (round goals: five_class, fusion, tune, segment, tsne)
"""

"""Console entry points (installed as ``mrssm-*`` commands, see
pyproject.toml; the repo's ``scripts/*.py`` are compatibility shims onto
these modules).

Each module mirrors one reference workflow:

- ``train``            — world-model training (ref train/.../MRSSM/main.py)
- ``estimate_state``   — offline batch state estimation (ref estimate_state.py)
- ``check_model``      — analysis artifacts (ref check_model.ipynb)
- ``train_behavior``   — Dreamer actor-critic on a trained world model
- ``train_online``     — full online Dreamer loop (env in the loop)
- ``eval_policy``      — greedy actor evaluation in an environment
- ``collect_sim_data`` — MuJoCo peg-insertion demonstration collection
- ``make_synthetic_dataset`` — COBOTTA-schema synthetic data
"""

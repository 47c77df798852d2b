"""Batched MPC: QP solvers, DCM-MPC transcription, whole-body control."""

"""Device meshes, shardings, and collective reductions (SURVEY.md §2.3)."""

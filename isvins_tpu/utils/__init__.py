"""Host-side utilities: synthetic worlds, EuRoC IO, TUM trajectory IO, timing."""

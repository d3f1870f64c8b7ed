"""Relational operators of the engine (SURVEY.md §2).

Each module is DataFrame→DataFrame, pure Catalyst unless a model or a
recurrence genuinely requires Python (see ``models``)."""

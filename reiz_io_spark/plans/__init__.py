"""Query planning: ReizQL lowering, the reference query set, structural matcher."""

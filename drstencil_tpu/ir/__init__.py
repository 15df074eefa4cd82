"""Stencil IR: `.stc` spec parsing and analysis passes."""

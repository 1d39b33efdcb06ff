"""Host-side utilities: NaN-shape tooling, transforms, plotting, adapters."""

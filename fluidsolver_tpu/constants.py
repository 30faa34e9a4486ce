"""Global numerical constants (reference: src/IR.hpp:16-17)."""

# Mixed-cell cutoffs for the VOF fraction.
VF_LOW = 1e-8
VF_HIGH = 1.0 - VF_LOW

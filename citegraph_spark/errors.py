"""Shared exception types for iterative distributed operators.

Round-bounded fixpoint loops (connected components, Borůvka MSF, truss
peeling) must FAIL LOUDLY when the round cap is exhausted before the
convergence check fires: a silently returned partial result looks
exactly like a converged one downstream, which is the worst failure
mode at 100 TB where nobody eyeballs the output. Callers that want a
best-effort answer can catch ConvergenceError explicitly.
"""

from __future__ import annotations


class ConvergenceError(RuntimeError):
    """An iterative operator hit its round cap before converging.

    Raised instead of returning a partial (and silently wrong) result.
    Carries the operator name and the round cap so logs are actionable:
    re-run with a larger ``max_rounds`` or inspect the input for the
    pathological shape (e.g. a chain-of-length-N graph fed to an
    O(log n)-round algorithm indicates a bug, not a small cap).
    """

    def __init__(self, operator: str, max_rounds: int) -> None:
        super().__init__(
            f"{operator} did not converge within max_rounds={max_rounds}; "
            "result would be partial — raise max_rounds or check the input"
        )
        self.operator = operator
        self.max_rounds = max_rounds

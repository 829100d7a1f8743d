"""Physical-plan inspection utilities."""

from .audit import PlanFacts, physical_plan, plan_facts

__all__ = ["PlanFacts", "physical_plan", "plan_facts"]

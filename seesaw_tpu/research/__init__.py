"""Research extras (reference `seesaw/research/`): experimental models that
sit outside the production loop registry."""

"""Plans: the driver-side crawl wave loop (the only imperative control
flow in the engine — every step inside a wave is declarative DataFrame
ops; SURVEY.md §4 'our planner is the wave-loop composition')."""

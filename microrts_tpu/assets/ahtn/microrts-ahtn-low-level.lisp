;; Adversarial HTN domain: the low-level tier.
;; Re-statement of the reference's
;; data/ahtn/microrts-ahtn-definition-low-level.lisp in the microrts_tpu
;; AHTN subset: decompositions bottom out in per-role operator choices
;; (which unit class does what), giving the planner a finer-grained
;; adversarial choice space than the portfolio tier.

(defdomain microrts-low-level
  (
    (:method dp-split (destroy-player)
      :tasks ((assign-workers) (assign-army)))

    ;; ---- worker role assignment
    (:method workers-all-harvest (assign-workers)
      :tasks ((!harvest 3) (!train Base Worker 6)))
    (:method workers-one-harvests (assign-workers)
      :tasks ((!harvest 1) (!train Base Worker 6)
              (!attack Worker Closest)))
    (:method workers-fight (assign-workers)
      :pre (enemy-in-range 6)
      :tasks ((!attack Worker Closest)))
    (:method workers-build-then-harvest (assign-workers)
      :pre (can-afford Barracks)
      :tasks ((!build Barracks 1) (!harvest 2)))

    ;; ---- army role assignment
    (:method army-closest (assign-army)
      :tasks ((!train Barracks Light 20) (!attack Light Closest)
              (!attack Heavy Closest) (!attack Ranged Closest)))
    (:method army-focus-weak (assign-army)
      :tasks ((!train Barracks Ranged 20) (!attack Ranged Weakest)
              (!attack Light Weakest) (!attack Heavy Weakest)))
    (:method army-hold (assign-army)
      :tasks ((!idle Light) (!idle Heavy) (!idle Ranged)))
  )
)

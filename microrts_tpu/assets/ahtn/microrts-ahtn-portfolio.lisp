;; Adversarial HTN domain: the portfolio tier.
;; Re-statement of the reference's
;; data/ahtn/microrts-ahtn-definition-portfolio.lisp (dp-rush-* methods:
;; a rush with a reserved harvester worker) and
;; microrts-ahtn-definition-flexible-portfolio.lisp (the script ladder) in
;; the microrts_tpu AHTN subset syntax (see bots/ahtn.py docstring):
;; every (:method NAME (TASK) [:pre COND] :tasks (SUBTASK ...)) decomposes
;; TASK; primitives (!train !build !harvest !attack !idle) compile to the
;; dense DSL (synth/dsl.py).

(defdomain microrts-portfolio
  (
    ;; root task: destroy the other player
    (:method dp-worker-rush (destroy-player)
      :tasks ((rush-economy 1) (mass Worker) (engage Closest)))

    (:method dp-worker-harass (destroy-player)
      :tasks ((rush-economy 1) (mass Worker) (engage Weakest)))

    (:method dp-light-rush (destroy-player)
      :tasks ((rush-economy 1) (build-military) (mass Light)
              (engage Closest)))

    (:method dp-ranged-rush (destroy-player)
      :tasks ((rush-economy 1) (build-military) (mass Ranged)
              (engage Weakest)))

    (:method dp-heavy-push (destroy-player)
      :pre (n-ally-of-type Worker 1)
      :tasks ((rush-economy 2) (build-military) (mass Heavy)
              (engage Strongest)))

    (:method dp-defend-then-rush (destroy-player)
      :pre (enemy-in-range 8)
      :tasks ((rush-economy 2) (mass Worker) (engage Closest)))

    ;; ---- sub-task: the harvest line (the dp-rush reserved worker)
    (:method econ-reserved (rush-economy ?n)
      :tasks ((!harvest ?n)))

    ;; ---- sub-task: barracks line
    (:method military-barracks (build-military)
      :tasks ((!build Barracks 1)))

    ;; ---- sub-task: unit massing
    (:method mass-worker (mass Worker)
      :tasks ((!train Base Worker 20)))
    (:method mass-light (mass Light)
      :tasks ((!train Base Worker 3) (!train Barracks Light 20)))
    (:method mass-heavy (mass Heavy)
      :tasks ((!train Base Worker 3) (!train Barracks Heavy 20)))
    (:method mass-ranged (mass Ranged)
      :tasks ((!train Base Worker 3) (!train Barracks Ranged 20)))

    ;; ---- sub-task: engagement (target-selection operators)
    (:method engage-closest (engage Closest)
      :tasks ((!attack All Closest)))
    (:method engage-weakest (engage Weakest)
      :tasks ((!attack All Weakest)))
    (:method engage-strongest (engage Strongest)
      :tasks ((!attack All Strongest)))
  )
)

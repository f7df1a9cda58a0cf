"""model_predictive_control_tpu — a TPU-native MPC / trajectory-optimization engine.

Built from scratch in JAX/XLA/Pallas, covering the capability range of the reference
MPC course repo (konnpaku-youmu/Model_Predictive_Control): finite-horizon LQR via
Riccati scans, constrained receding-horizon linear MPC as condensed box-QPs,
reference-tracking MPC with warm starts, and nonlinear single-shooting SQP MPC for
kinematic-bicycle parking with covering-circle obstacle avoidance — batched over
scenarios, sharded over TPU meshes.

See SURVEY.md for the structural analysis of the reference and citations per module.
"""

from .models.linear import (
    LinearSystem,
    double_integrator_continuous,
    double_integrator_discrete,
    session2_dynamics,
)
from .models.parameters import VehicleParameters
from .models.bicycle import (
    DynamicBicycle,
    KinematicBicycle,
    dynamic_bicycle_ode,
    kinematic_bicycle_ode,
)
from .ops.integrators import euler, heun, rk4, rk4_fine, get_integrator
from .ops.riccati import riccati_recursion, dare_sda, dare_residual, lqr_gain
from .ops.parallel_horizon import (
    affine_rollout_parallel,
    lqt_solve_parallel,
    riccati_recursion_parallel,
    rollout_parallel,
)
from .control.simulate import (
    SimResult,
    simulate,
    rollout,
    policy_from_law,
    open_loop_policy,
)
from .solvers.lqr import (
    LQRSolution,
    solve_finite_horizon,
    solve_infinite_horizon,
    receding_horizon_policy,
    prediction_policy,
    cost_to_go,
    lqr_terminal_set,
)
from .ops.condensed import (
    CondensedQP,
    SoftCondensedQP,
    build_condensed_qp,
    prediction_matrices,
    soften_condensed_qp,
)
from .solvers.qp import (
    QPOperator,
    QPSolution,
    qp_setup,
    admm_solve,
    pdip_solve,
)
from .solvers.implicit import (
    admm_solve_implicit,
    pdip_solve_implicit,
    make_implicit_qp_solver,
    make_implicit_al_ilqr_solver,
    make_implicit_al_ilqr_param_solver,
    stagewise_ip_solve_implicit,
)
from .estimation import (
    ExtendedKalmanFilter,
    KalmanFilter,
    MHE,
    ekf_output_feedback_policy,
    ekf_trajectory,
    initial_ekf_carry,
    initial_output_feedback_carry,
    kalman_filter_trajectory,
    kalman_gain,
    make_mhe,
    output_feedback_policy,
)
from .tuning import (
    TuneResult,
    make_closed_loop_cost,
    make_parking_closed_loop_cost,
    theta_to_weights,
    tune_mpc_weights,
    tune_parking_weights,
)
from .solvers.sqp import ShootingOCP, SQPSolution, sqp_solve
from .solvers.ilqr import (
    ALILQRSolution,
    ILQRProblem,
    ILQRSolution,
    al_ilqr_solve,
    ilqr_solve,
)
from .ops.pallas.ilqr_factory import (
    BatchedTrackerSolution,
    fused_tracker_solve,
    make_fused_tracker,
    matan,
    rowform_to_vector,
    step_jacobian_pattern,
)
from .ops.pallas.parking_factory import al_ilqr_parking_solve_factory
from .solvers.parking import make_parking_ocp, make_parking_ilqr, NonlinearMPC
from .solvers.nmpc_tracking import TrackingNMPC
from .solvers.linear_mpc import (
    BoxProblem,
    Problem,
    LinearMPC,
    as_box_problem,
    make_box_mpc,
    make_linear_mpc,
    session2_problem,
    session3_problem,
)
from .solvers.tube import (
    TubeMPC,
    make_tube_mpc,
    mrpi_box_margins,
)
from .solvers.stochastic import (
    StochasticMPC,
    gaussian_stage_margins,
    make_stochastic_mpc,
)
from .solvers.offset_free import (
    OffsetFreeMPC,
    make_offset_free_mpc,
)
from .solvers.offset_free_nmpc import (
    DisturbanceCompensatedTracking,
    OffsetFreeNMPC,
)
from .estimation_nl import (
    NonlinearMHE,
    initial_mhe_feedback_carry,
    mhe_output_feedback_policy,
)
from .solvers.rate_mpc import (
    RateCondensedQP,
    RateLimitedMPC,
    build_rate_condensed_qp,
    make_rate_limited_mpc,
)
from .solvers.riccati_ip import (
    StagewiseIPResult,
    StagewiseMPC,
    make_stagewise_mpc,
    stagewise_ip_solve,
)

__version__ = "0.1.0"

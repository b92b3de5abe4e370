function mpc = case5
% Hand-built 5-bus ACOPF test case (NOT a pglib case): exercises the full
% MATPOWER feature set — tap ratio, phase shift, line charging, bus shunt,
% thermal rates, angle-difference limits, out-of-service branch and gen.
mpc.version = '2';
mpc.baseMVA = 100;

%% bus data
%	bus_i	type	Pd	Qd	Gs	Bs	area	Vm	Va	baseKV	zone	Vmax	Vmin
mpc.bus = [
	1	3	0	0	0	0	1	1.05	0	230	1	1.1	0.9;
	2	1	80	30	0	0	1	1.0	0	230	1	1.1	0.9;
	3	2	20	10	0	0	1	1.04	0	230	1	1.1	0.9;
	4	1	60	20	0	5	1	1.0	0	230	1	1.1	0.9;
	5	1	40	15	0	0	1	1.0	0	230	1	1.1	0.9;
];

%% generator data
%	bus	Pg	Qg	Qmax	Qmin	Vg	mBase	status	Pmax	Pmin
mpc.gen = [
	1	100	0	100	-100	1.05	100	1	250	10;
	2	50	0	50	-50	1.0	100	0	100	0;
	3	80	0	80	-80	1.04	100	1	150	10;
];

%% branch data
%	fbus	tbus	r	x	b	rateA	rateB	rateC	ratio	angle	status	angmin	angmax
mpc.branch = [
	1	2	0.02	0.06	0.03	150	150	150	0	0	1	-30	30;
	1	3	0.08	0.24	0.025	80	80	80	0	0	1	-360	360;
	2	3	0.06	0.18	0.02	80	80	80	0	0	1	-360	360;
	2	4	0.06	0.18	0.02	80	80	80	0	0	1	-360	360;
	2	5	0.04	0.12	0.015	80	80	80	0	0	1	-360	360;
	3	4	0.01	0.03	0.01	80	80	80	0	0	1	-360	360;
	4	5	0.08	0.24	0.025	80	80	80	0.98	1.0	1	-360	360;
	1	5	0.05	0.15	0.02	80	80	80	0	0	0	-360	360;
];

%% generator cost data (polynomial)
%	model	startup	shutdown	n	c2	c1	c0
mpc.gencost = [
	2	0	0	3	0.01	20	0;
	2	0	0	3	0.02	25	0;
	2	0	0	3	0.0125	15	0;
];
